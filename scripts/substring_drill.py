#!/usr/bin/env python
"""Exact-substring span removal at drill scale (round 7).

Runs ``dedup.remove_duplicated_spans`` over the 2.6M-turn Zipf corpus
(same fixture as scripts/dedup_drill.py) at local[8] tuned confs and
records wall time, shuffle bytes (Spark UI REST), and removal stats —
the at-scale evidence that the two-exchange plan (gram hash, then id)
holds when the gram explode is ~40x the corpus row count.

Usage: python scripts/substring_drill.py [--convs 60000] [--cpus 8]
       [--gram-n 5] [--min-span 25]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def _stages(ui: str) -> list[dict]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    return json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--convs", type=int, default=60000)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--workdir", default="/tmp/dedup_drill")
    ap.add_argument("--gram-n", type=int, default=5)
    ap.add_argument(
        "--min-span",
        type=int,
        default=25,
        help="tokens; the Lee-et-al production setting is 50, the "
        "fixture turns are short so the drill default is 25",
    )
    ap.add_argument(
        "--keep-first",
        action="store_true",
        help="Lee-et-al production mode: first occurrence survives",
    )
    args = ap.parse_args()

    from accelerated_intelligent_document_processing_on_aws_spark.fixtures import (
        write_transcripts_parquet,
    )
    from accelerated_intelligent_document_processing_on_aws_spark.operators import (
        dedup,
    )
    from accelerated_intelligent_document_processing_on_aws_spark.sources.session import (
        get_spark,
    )

    os.makedirs(args.workdir, exist_ok=True)
    corpus = os.path.join(args.workdir, f"transcripts_{args.convs}.parquet")
    if not os.path.exists(corpus):
        n = write_transcripts_parquet(corpus, n_convs=args.convs, seed=42)
        print(f"corpus written: {n} turns", file=sys.stderr)

    spark = get_spark(
        app_name="substring-drill",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus * 4, 32),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            "spark.ui.enabled": "true",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl

    docs = spark.read.parquet(corpus).select(
        F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string")).alias(
            "doc_id"
        ),
        "text",
    )
    n_docs = docs.count()
    print(f"{n_docs} turn-docs at local[{args.cpus}]", file=sys.stderr)

    out_path = os.path.join(args.workdir, "substring_cleaned.parquet")
    t0 = time.perf_counter()
    cleaned = dedup.remove_duplicated_spans(
        docs, gram_n=args.gram_n, min_span_tokens=args.min_span,
        keep_first=args.keep_first,
    )
    cleaned.write.mode("overwrite").parquet(out_path)
    wall = time.perf_counter() - t0

    st = _stages(ui)
    sw = sum(s.get("shuffleWriteBytes", 0) for s in st)
    sr = sum(s.get("shuffleReadBytes", 0) for s in st)
    peak = max((s.get("shuffleWriteBytes", 0) for s in st), default=0)

    agg = (
        spark.read.parquet(out_path)
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum("n_tokens").alias("tokens_in"),
            F.sum("n_removed").alias("tokens_removed"),
            F.sum((F.col("n_removed") > 0).cast("long")).alias("docs_touched"),
        )
        .collect()[0]
    )

    result = {
        "n_docs": n_docs,
        "cpus": args.cpus,
        "gram_n": args.gram_n,
        "min_span_tokens": args.min_span,
        "keep_first": args.keep_first,
        "wall_sec": round(wall, 1),
        "turns_per_sec": round(n_docs / wall, 1),
        "shuffle_write_mb": round(sw / 1e6, 1),
        "shuffle_read_mb": round(sr / 1e6, 1),
        "peak_stage_write_mb": round(peak / 1e6, 1),
        "rows_out": agg["rows"],
        "tokens_in": int(agg["tokens_in"]),
        "tokens_removed": int(agg["tokens_removed"]),
        "docs_touched": int(agg["docs_touched"]),
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
