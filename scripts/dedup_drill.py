#!/usr/bin/env python
"""Dedup-at-scale drill (round-5 verdict item 4): run the full
curation chain end-to-end on the 2.6M-turn Zipf corpus at local[8]
tuned confs, recording wall time and shuffle bytes per stage.

Chain (each stage materialized so the next one's cost is its own):
  1. minhash LSH near-dup pairs   (one scan, one banded shuffle)
  2. connected-component clusters (iterative min-label propagation)
  3. dedup_keep_representative    (clusters-only quality scoring,
                                   broadcast loser anti-join)
  4. split-leakage gate           (one (content_hash, split) shuffle)

Shuffle bytes come from the Spark UI REST API (enabled just for this
drill): per-phase delta of completed-stage shuffle read/write totals,
plus the single largest stage write — the number that must stay
bounded per partition at 100 TB.

Usage: python scripts/dedup_drill.py [--convs 60000] [--cpus 8]
Prints a per-stage markdown table + one JSON line.
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
    ap.add_argument(
        "--resume",
        action="store_true",
        help="reuse an existing pairs.parquet from a prior run "
        "(stage-1 wall/shuffle numbers then come from that run's log)",
    )
    ap.add_argument(
        "--carry-shingles",
        choices=("true", "false"),
        default="true",
        help="stage-1 verify strategy: true = shingle hash sets ride "
        "the banded shuffle (one scan, zero joins, fat shuffle); "
        "false = ship only band hashes, second text scan + two joins "
        "(lean shuffle) — the network-bound-regime alternative",
    )
    ap.add_argument(
        "--stage1-only",
        action="store_true",
        help="measure only the LSH pairs stage (strategy A/B runs)",
    )
    args = ap.parse_args()
    carry = args.carry_shingles == "true"

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
        app_name="dedup-drill",
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

    report: list[dict] = []
    seen: set = set()

    def run_stage(name: str, fn):
        nonlocal seen
        t0 = time.perf_counter()
        out = fn()
        wall = time.perf_counter() - t0
        st = _stages(ui)
        fresh = [
            s
            for s in st
            if (s["stageId"], s["attemptId"]) not in seen
        ]
        seen |= {(s["stageId"], s["attemptId"]) for s in st}
        sw = sum(s.get("shuffleWriteBytes", 0) for s in fresh)
        sr = sum(s.get("shuffleReadBytes", 0) for s in fresh)
        peak = max(
            (s.get("shuffleWriteBytes", 0) for s in fresh), default=0
        )
        report.append(
            {
                "stage": name,
                "wall_sec": round(wall, 1),
                "shuffle_write_mb": round(sw / 1e6, 1),
                "shuffle_read_mb": round(sr / 1e6, 1),
                "peak_stage_write_mb": round(peak / 1e6, 1),
                "result": out,
            }
        )
        print(
            f"  {name}: {wall:.1f}s write={sw / 1e6:.0f}MB "
            f"read={sr / 1e6:.0f}MB peak_stage={peak / 1e6:.0f}MB -> {out}",
            file=sys.stderr,
        )

    pairs_path = os.path.join(args.workdir, "pairs.parquet")

    def s1():
        p = dedup.minhash_lsh_pairs(docs, carry_shingles=carry)
        p.write.mode("overwrite").parquet(pairs_path)
        return {"pairs": spark.read.parquet(pairs_path).count()}

    stage1_name = f"minhash_lsh_pairs[carry={str(carry).lower()}]"
    if args.resume and os.path.exists(pairs_path):
        print("resume: reusing pairs.parquet", file=sys.stderr)
    else:
        run_stage(stage1_name, s1)
    if args.stage1_only:
        print("\n| stage | wall s | shuffle write MB | shuffle read MB | "
              "peak stage write MB |")
        print("|---|---|---|---|---|")
        for r in report:
            print(
                f"| {r['stage']} | {r['wall_sec']} | {r['shuffle_write_mb']} | "
                f"{r['shuffle_read_mb']} | {r['peak_stage_write_mb']} |"
            )
        print()
        print(json.dumps({"n_docs": n_docs, "cpus": args.cpus, "stages": report}))
        return
    pairs = spark.read.parquet(pairs_path)

    def s2():
        c = dedup.duplicate_clusters(pairs)
        cp = os.path.join(args.workdir, "clusters.parquet")
        c.write.mode("overwrite").parquet(cp)
        cdf = spark.read.parquet(cp)
        return {
            "clustered_docs": cdf.count(),
            "clusters": cdf.select("cluster_id").distinct().count(),
        }

    run_stage("duplicate_clusters", s2)

    def s3():
        kept = dedup.dedup_keep_representative(docs, pairs)
        return {"kept_docs": kept.count(), "removed": n_docs}

    run_stage("keep_representative", s3)

    def s4():
        d = docs.select(
            F.md5(F.col("text")).alias("content_hash"),
            F.when(
                F.conv(
                    F.substring(F.md5(F.col("doc_id")), 1, 4), 16, 10
                ).cast("bigint")
                % 10
                < 8,
                "train",
            )
            .when(
                F.conv(
                    F.substring(F.md5(F.col("doc_id")), 1, 4), 16, 10
                ).cast("bigint")
                % 10
                < 9,
                "valid",
            )
            .otherwise("test")
            .alias("split"),
        )
        g = d.groupBy("content_hash").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("split").alias("n_splits"),
        )
        row = g.agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum(F.when(F.col("n_splits") > 1, 1).otherwise(0)).alias(
                "n_leaky_groups"
            ),
        ).first()
        return {"n_groups": row[0], "n_leaky_groups": int(row[1] or 0)}

    run_stage("split_leakage_gate", s4)

    # fix up the keep-representative removed count now that both
    # numbers exist
    for r in report:
        if r["stage"] == "keep_representative":
            r["result"]["removed"] = n_docs - r["result"]["kept_docs"]

    print("\n| stage | wall s | shuffle write MB | shuffle read MB | "
          "peak stage write MB |")
    print("|---|---|---|---|---|")
    for r in report:
        print(
            f"| {r['stage']} | {r['wall_sec']} | {r['shuffle_write_mb']} | "
            f"{r['shuffle_read_mb']} | {r['peak_stage_write_mb']} |"
        )
    print()
    print(
        json.dumps(
            {"n_docs": n_docs, "cpus": args.cpus, "stages": report}
        )
    )


if __name__ == "__main__":
    main()
