#!/usr/bin/env python
"""Capture .explain('formatted') output for the round-8 touched queries.

Usage: python scripts/r08_plans.py <out_dir> <suffix> [query,query,...]

Runs each registry query against sf0.1 (plan shape is SF-independent)
and writes ``<out_dir>/<name>_<suffix>.txt``.  The extraction paths are
captured as pseudo-queries ``extract_salted`` / ``extract_noshuffle`` /
``extract_skew_aware`` over the bench corpus when it exists."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT = (
    "simhash_near_dup,minhash_lsh_near_dup,fuzzy_levenshtein_pairs,"
    "ann_bruteforce_topk,ann_lsh_topk,duplicate_ngram_spans,"
    "unigram_logppl_docs,bigram_logppl_docs,image_decode_stats,"
    "layout_tables_cells,layout_table_markdown,multimodal_features,"
    "near_dup_clusters,dedup_exact_groups,anti_join_resume,"
    "token_counts,exact_substring_dedup_docs"
)


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = (sys.argv[3] if len(sys.argv) > 3 else DEFAULT).split(",")
    os.makedirs(out_dir, exist_ok=True)

    from accelerated_intelligent_document_processing_on_aws_spark.plans import QUERIES
    from accelerated_intelligent_document_processing_on_aws_spark.sources.session import (
        get_spark,
    )

    spark = get_spark(
        app_name="r08-plans",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    for n in names:
        if n not in QUERIES:
            print(f"skip {n}: not in registry")
            continue
        df = QUERIES[n](spark, sf)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(out_dir, f"{n}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {n}_{suffix}.txt")

    corpus = "/tmp/spark_graft_bench/transcripts_20000.parquet"
    if os.path.exists(corpus):
        from accelerated_intelligent_document_processing_on_aws_spark.operators.extract import (
            extract_turns,
            extract_turns_skew_aware,
        )

        tr = spark.read.parquet(corpus)
        for name, df in (
            ("extract_salted", extract_turns(tr, num_partitions=96, salt=16)),
            ("extract_noshuffle", extract_turns(tr, salt=0)),
            (
                "extract_skew_aware",
                extract_turns_skew_aware(tr, num_partitions=32, heavy_turns=200),
            ),
        ):
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            # scan parallelism is the load-bearing fact for the round-8
            # extract change; record it next to the plan
            txt = f"scan_partitions={tr.rdd.getNumPartitions()}\n" + txt
            with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(txt)
            print(f"wrote {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
