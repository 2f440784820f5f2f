#!/usr/bin/env python
"""Bloom incremental dedup at drill scale: plain anti-join vs the
Bloom-pruned plan on the 2.6M-turn Zipf corpus (round 7).

Reference snapshot = even-indexed conversations, incoming = odd — the
realistic incremental-ingestion split (heavy cross-half exact-text
duplication because turns are template-generated).  Both paths must
return the SAME row count (exact anti-join semantics); the drill
records wall + shuffle bytes per phase so the claimed pruning is a
measured number, not an argument.

Usage: python scripts/bloom_drill.py [--convs 60000] [--cpus 8]
       [--m-bits-log2 27] [--k 7]
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
    ap.add_argument("--m-bits-log2", type=int, default=27,
                    help="2^27 bits = 16 MB bitmap")
    ap.add_argument("--k", type=int, default=7)
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
        app_name="bloom-drill",
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

    base = spark.read.parquet(corpus).select(
        "conv_id",
        F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string")).alias(
            "doc_id"
        ),
        F.md5("text").alias("content_hash"),
    )
    half = F.xxhash64("conv_id") % 2 == 0
    ref = base.where(half).select("content_hash")
    incoming = base.where(~half).select("doc_id", "content_hash")
    n_ref, n_inc = ref.count(), incoming.count()
    print(f"ref={n_ref} incoming={n_inc}", file=sys.stderr)

    seen: set = set()

    def phase(fn):
        nonlocal seen
        t0 = time.perf_counter()
        out = fn()
        wall = time.perf_counter() - t0
        st = _stages(ui)
        fresh = [s for s in st if (s["stageId"], s["attemptId"]) not in seen]
        seen |= {(s["stageId"], s["attemptId"]) for s in st}
        sw = sum(s.get("shuffleWriteBytes", 0) for s in fresh)
        return out, round(wall, 1), round(sw / 1e6, 1)

    phase(lambda: None)  # absorb the setup counts

    plain_n, plain_wall, plain_mb = phase(
        lambda: incoming.join(
            ref.distinct(), "content_hash", "left_anti"
        ).count()
    )

    bm, build_wall, build_mb = phase(
        lambda: dedup.bloom_build(
            ref, "content_hash", m_bits=1 << args.m_bits_log2, k=args.k
        )
    )
    bloom_n, probe_wall, probe_mb = phase(
        lambda: dedup.bloom_incremental_dedup(
            incoming, ref, bm, "content_hash"
        ).count()
    )

    result = {
        "n_ref": n_ref,
        "n_incoming": n_inc,
        "cpus": args.cpus,
        "m_bits": 1 << args.m_bits_log2,
        "k": args.k,
        "bitmap_mb": round(len(bm) / 1e6, 1),
        "plain_antijoin": {
            "novel_rows": plain_n, "wall_sec": plain_wall,
            "shuffle_write_mb": plain_mb,
        },
        "bloom": {
            "novel_rows": bloom_n,
            "build_sec": build_wall, "build_shuffle_mb": build_mb,
            "probe_verify_sec": probe_wall, "probe_shuffle_mb": probe_mb,
            "total_sec": round(build_wall + probe_wall, 1),
        },
        "rows_match": plain_n == bloom_n,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
