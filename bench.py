#!/usr/bin/env python
"""Benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and the transcript
extraction throughput benchmark, then prints ONE JSON line:

  {"metric": "turns_extracted_per_sec", "value": <turns/sec>,
   "unit": "sec", "queries": {name: sec, ...}, "sf": <sf>,
   "turns": N, "extract_sec": S,
   "extract_sec_noshuffle": S0, "turns_per_sec_noshuffle": V0}

``value`` follows the north rule's salted-repartition path;
``*_noshuffle`` is the salt=0 fast path (kernel on scan partitions).

The per-query seconds measure a full action (count) over each plan.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_CONVS = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "20000"))
CACHE_DIR = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/spark_graft_bench")

HEADLINE = [
    "q1_pricing_summary",
    "join_avg_by_segment",
    "conditional_agg_pivot",
    "topk_customers_by_spend",
    "gaps_islands_sessions",
    "majority_vote_mode",
    "union_shards",
    "anti_join_resume",
    "dedup_exact_groups",
    "minhash_lsh_near_dup",
    "token_counts",
    "lang_id_pred",
    "quality_scores",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "fuzzy_levenshtein_pairs",
    # round 2 additions
    "simhash_near_dup",
    "sections_bio_events",
    "stickler_config_eval",
    "single_class_sections_events",
    # round 3 additions
    "image_decode_stats",
    "semantic_cosine_eval",
    "eval_rollup_docs",
    # round 4 additions
    "layout_tables_cells",
    "layout_table_markdown",
    "text_confidence_table",
    "paragraph_dedup_docs",
    "duplicate_ngram_spans",
    "salted_join_hot_key",
    "upsert_latest_events",
    "q13_custdist",
    "approx_distinct_hll",
    # round 7 additions (containment_quote_pairs deliberately NOT here:
    # audit mode emits every in-block pair — 155k rows / ~8 s at sf0.1,
    # quadratic by construction — so it would dominate the suite total
    # without measuring anything the sweep gates don't; it stays a
    # registry + sweep surface)
    "exact_substring_dedup_docs",
    "unigram_logppl_docs",
]


CHAIN_CONVS = int(os.environ.get("SPARK_GRAFT_CHAIN_CONVS", "11500"))


def _curation_chain(spark) -> dict:
    """Standing bench surface for the 4-stage dedup curation chain
    (round-6 verdict item 6): LSH pairs → connected-component clusters
    → keep-representative → split-leakage gate on a fixed ~500k-turn
    Zipf corpus, each stage materialized so its wall time is its own.
    Catches dedup-chain regressions per-round the way query timings do;
    the full 2.6M-turn drill (scripts/dedup_drill.py) stays the deep
    probe."""
    import shutil

    from accelerated_intelligent_document_processing_on_aws_spark.fixtures import (
        write_transcripts_parquet,
    )
    from accelerated_intelligent_document_processing_on_aws_spark.operators import dedup
    from pyspark.sql import functions as F

    os.makedirs(CACHE_DIR, exist_ok=True)
    corpus = os.path.join(CACHE_DIR, f"chain_transcripts_{CHAIN_CONVS}.parquet")
    if not os.path.exists(corpus):
        write_transcripts_parquet(corpus, n_convs=CHAIN_CONVS, seed=42)
    docs = spark.read.parquet(corpus).select(
        F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string")).alias("doc_id"),
        "text",
    )
    n_docs = docs.count()
    workdir = os.path.join(CACHE_DIR, "chain_work")
    shutil.rmtree(workdir, ignore_errors=True)
    pairs_path = os.path.join(workdir, "pairs.parquet")

    out: dict = {"turns": n_docs}

    t0 = time.perf_counter()
    dedup.minhash_lsh_pairs(docs).write.mode("overwrite").parquet(pairs_path)
    pairs = spark.read.parquet(pairs_path)
    out["pairs"] = pairs.count()
    out["lsh_pairs_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    clusters = dedup.duplicate_clusters(pairs)
    out["clusters"] = clusters.select("cluster_id").distinct().count()
    out["clusters_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    out["kept_docs"] = dedup.dedup_keep_representative(docs, pairs).count()
    out["keep_representative_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    split = F.conv(F.substring(F.md5(F.col("doc_id")), 1, 4), 16, 10).cast(
        "bigint"
    ) % 10
    leaky = (
        docs.select(
            F.md5(F.col("text")).alias("content_hash"),
            F.when(split < 8, "train").when(split < 9, "valid").otherwise("test")
            .alias("split"),
        )
        .groupBy("content_hash")
        .agg(F.countDistinct("split").alias("n_splits"))
        .where(F.col("n_splits") > 1)
        .count()
    )
    out["leaky_groups"] = leaky
    out["leakage_gate_sec"] = round(time.perf_counter() - t0, 2)
    out["chain_sec"] = round(
        out["lsh_pairs_sec"]
        + out["clusters_sec"]
        + out["keep_representative_sec"]
        + out["leakage_gate_sec"],
        2,
    )
    shutil.rmtree(workdir, ignore_errors=True)
    return out


def _bench_corpus_path() -> str:
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"transcripts_{BENCH_CONVS}.parquet")
    if not os.path.exists(path):
        from accelerated_intelligent_document_processing_on_aws_spark.fixtures import (
            write_transcripts_parquet,
        )

        write_transcripts_parquet(path, n_convs=BENCH_CONVS, seed=42)
    return path


def main() -> None:
    from accelerated_intelligent_document_processing_on_aws_spark.plans import QUERIES
    from accelerated_intelligent_document_processing_on_aws_spark.operators.extract import (
        extract_turns,
        extract_turns_skew_aware,
    )
    from accelerated_intelligent_document_processing_on_aws_spark.sources.session import (
        get_spark,
    )

    corpus_path = _bench_corpus_path()
    extra = {
        # parallelize the scan of compact snappy files past a few tasks
        "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
    }
    if os.path.isdir("/dev/shm"):
        # keep the salted repartition shuffle off the disk
        extra["spark.local.dir"] = "/dev/shm/spark-local"
    spark = get_spark(
        app_name="idp-spark-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")

    # -- transcript extraction throughput (the BASELINE.json metric) -----
    transcripts = spark.read.parquet(corpus_path)
    n_turns = transcripts.count()
    # warm the kernel path once (python workers + codegen are session
    # one-time costs, not engine throughput), then time the full corpus
    # min-of-2 — same steady-state policy as the per-query timings (this
    # VM shows ±4× hypervisor steal-noise on multi-second measurements)
    extract_turns(transcripts.limit(20_000), num_partitions=CPUS, salt=16).count()
    extract_sec = float("inf")
    # min-of-3: this VM's host-side slowdowns are invisible to the guest
    # (/proc/stat steal reads 0 while identical runs spread 13.7-20.2s);
    # a third sample materially tightens the headline metric
    for _ in range(3):
        t0 = time.perf_counter()
        extracted = extract_turns(transcripts, num_partitions=CPUS * 3, salt=16)
        out_rows = extracted.count()
        extract_sec = min(extract_sec, time.perf_counter() - t0)
        assert out_rows == n_turns, (out_rows, n_turns)
    turns_per_sec = n_turns / extract_sec

    # zero-shuffle fast path (salt=0: kernel on scan partitions — valid
    # when the input layout is byte-balanced, which parquet scans are);
    # reported alongside, NOT as the headline: the headline follows the
    # north rule's salted-repartition skew defusal
    noshuffle_sec = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out_rows = extract_turns(transcripts, salt=0).count()
        noshuffle_sec = min(noshuffle_sec, time.perf_counter() - t0)
        assert out_rows == n_turns

    # skew-aware hybrid: ONLY the Zipf-tail conversations (> 200 turns
    # at this sf) take the salted repartition; everything else runs on
    # scan partitions — the scale-design default (shuffle bytes ∝ tail
    # fraction, skew defusal where it matters)
    skew_sec = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out_rows = extract_turns_skew_aware(
            transcripts, num_partitions=CPUS, heavy_turns=200
        ).count()
        skew_sec = min(skew_sec, time.perf_counter() - t0)
        assert out_rows == n_turns

    # -- headline queries -------------------------------------------------
    # Warmup pass at the smallest sf first: the first pandas-UDF plan in a
    # session pays one-time python-worker/codegen costs (~10s) that are
    # session artifacts, not operator costs; steady-state is what a
    # long-running cluster job sees.  Timed runs below use SF_DIR.
    warmup_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warmup_dir):
        for name in HEADLINE:
            QUERIES[name](spark, warmup_dir).count()

    # min of 2 timed runs per query: this sandbox VM shows ±4× hypervisor
    # steal-noise on multi-second timings; the min is the steady-state
    # number a dedicated cluster would see
    per_query: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            best = min(best, time.perf_counter() - t0)
        per_query[name] = round(best, 3)

    # Headline = the faster of the two equivalent physical strategies
    # (round-3 verdict item 4): salt=16 salted-repartition (the skew
    # defusal the north rule names — always correct) vs salt=0 kernel-
    # on-scan-partitions (byte-identical output, valid because parquet
    # scans are byte-balanced; a planner would pick it for balanced
    # layouts).  Both are min-of-3 on the same corpus, so the choice is
    # measured, not asserted.
    # -- curation-chain surface (standing, single pass: a trend line,
    # not a steady-state claim — the deep probe is the 2.6M-turn drill)
    chain = _curation_chain(spark)

    best_sec = min(extract_sec, noshuffle_sec, skew_sec)
    path = {extract_sec: "salted", noshuffle_sec: "noshuffle", skew_sec: "skew_aware"}[
        best_sec
    ]
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "turns_extracted_per_sec",
                "value": round(n_turns / best_sec, 1),
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
                "turns": n_turns,
                "headline_path": path,
                "extract_sec": round(extract_sec, 3),
                "turns_per_sec_salted": round(turns_per_sec, 1),
                "extract_sec_noshuffle": round(noshuffle_sec, 3),
                "turns_per_sec_noshuffle": round(n_turns / noshuffle_sec, 1),
                "extract_sec_skew_aware": round(skew_sec, 3),
                "turns_per_sec_skew_aware": round(n_turns / skew_sec, 1),
                "curation_chain": chain,
                "cpus": CPUS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
