#!/usr/bin/env python
"""Round-8 measurement probe: where do the slow bench queries spend
their time?  Isolates stages with noop sinks (guide §1.4) and prints
row/bucket/pair volumes so the optimization targets are data-backed,
not guessed.  Not part of the bench contract."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.2f}s -> {out}", flush=True)
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    from accelerated_intelligent_document_processing_on_aws_spark.operators import (
        dedup,
    )
    from accelerated_intelligent_document_processing_on_aws_spark.sources.session import (
        get_spark,
    )
    from accelerated_intelligent_document_processing_on_aws_spark.sources.tables import (
        load_table,
    )

    spark = get_spark(
        app_name="r08-probe",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
        extra_conf={"spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024)},
    )
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    d = load_table(spark, SF_DIR, "documents")
    t("documents rows", d.count)
    t("documents text bytes", lambda: d.agg(F.sum(F.length("text"))).first()[0])

    # ---- simhash_near_dup decomposition --------------------------------
    d4 = d.where(F.col("doc_id") % 4 == 0)
    n4 = t("docs %4==0", d4.count)

    from accelerated_intelligent_document_processing_on_aws_spark.operators.dedup import (
        simhash64_udf,
    )

    fp = d4.where(
        F.col("text").isNotNull() & (F.trim(F.col("text")) != "")
    ).select(F.col("doc_id").alias("id"), simhash64_udf()(F.col("text")).alias("fp"))
    sc.setJobDescription("simhash: fingerprint only")
    t("simhash fingerprint noop", lambda: noop(fp))
    t("simhash distinct fp", lambda: fp.select("fp").distinct().count())
    # bucket histogram at chunk granularity
    n_chunks = 8
    widths = [64 // n_chunks for _ in range(n_chunks)]
    offsets = [sum(widths[:i]) for i in range(n_chunks)]
    chunks = fp.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("chunk_idx"),
                        F.shiftrightunsigned(F.col("fp"), offsets[i])
                        .bitwiseAND(F.lit((1 << widths[i]) - 1))
                        .alias("chunk"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select("id", "c.chunk_idx", "c.chunk")
    sizes = chunks.groupBy("chunk_idx", "chunk").count()
    t(
        "simhash bucket sizes top5",
        lambda: sizes.orderBy(F.desc("count")).limit(5).collect(),
    )
    t(
        "simhash candidate pair volume (sum size^2/2 for 2<=size<=4096)",
        lambda: sizes.where((F.col("count") >= 2) & (F.col("count") <= 4096))
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2))
        .first()[0],
    )
    t(
        "simhash overcap pair volume",
        lambda: sizes.where(F.col("count") > 4096)
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2))
        .first()[0],
    )
    sc.setJobDescription("simhash: full")
    out = dedup.simhash_pairs(d4, max_hamming=7)
    t("simhash full count", out.count)
    t("simhash full count (2nd)", out.count)

    # ---- minhash decomposition ----------------------------------------
    sc.setJobDescription("minhash: full")
    mh = dedup.minhash_lsh_pairs(
        d, shingle_n=2, num_hashes=32, bands=8, jaccard_threshold=0.3
    )
    t("minhash full count", mh.count)
    udf = dedup.minhash_bands_shingles_udf(2, 32, 8)
    base = d.select(F.col("doc_id").alias("id"), udf(F.col("text")).alias("s"))
    sc.setJobDescription("minhash: signature only")
    t("minhash sig noop", lambda: noop(base))
    banded = base.select(
        "id", F.posexplode("s.bands").alias("band_idx", "band_hash")
    )
    bsizes = banded.groupBy("band_idx", "band_hash").count()
    t(
        "minhash bucket top5",
        lambda: bsizes.orderBy(F.desc("count")).limit(5).collect(),
    )
    t(
        "minhash candidate pairs (2<=s<=64)",
        lambda: bsizes.where((F.col("count") >= 2) & (F.col("count") <= 64))
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2))
        .first()[0],
    )
    t(
        "minhash dropped bucket rows (s>64)",
        lambda: bsizes.where(F.col("count") > 64).count(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
