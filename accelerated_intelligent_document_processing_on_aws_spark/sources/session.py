"""SparkSession construction with the engine's standard configuration.

Local mode stands in for a multi-executor cluster in this sandbox; the
configuration is written for both: AQE on (runtime skew-join splitting
and shuffle-partition coalescing), Arrow enabled for the pandas-UDF
kernel, UTC session timezone so results compare bit-for-bit against the
DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "idp-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # scan-split floor (round 8): a multi-row-group file under
        # maxPartitionBytes × cores still splits into too few tasks for
        # the kernel-on-scan-partitions paths (the 190 MB / 107-row-group
        # bench corpus scanned as 12 tasks on 32 cores — the salt=0 and
        # skew-aware extraction legs ran at 1/3 parallelism).  The floor
        # is derived from the core count (3× — the round-2 sweep's kernel
        # partition multiple), never a constant, so a cluster-scale scan
        # with thousands of natural splits is untouched; single-row-group
        # files keep their openCost floor (this knob cannot over-split
        # tiny files).
        .config(
            "spark.sql.files.minPartitionNum",
            os.environ.get("SPARK_SCAN_MIN_PARTITIONS", str(3 * cpus)),
        )
        # 2 MB open-cost (default 4 MB): with the floor above, split size
        # is max(openCost, total/minPartitionNum) — the 4 MB default
        # quantized the 190 MB bench corpus to 46 splits instead of ~96.
        # 2 MB keeps the corpus at ~95 splits while halving the empty
        # byte-range splits the floor creates on small single-row-group
        # files (a split only reads row groups whose midpoint lands in
        # it).  Local NVMe/tmpfs per-file open cost is microseconds; a
        # cluster against object storage should raise this back
        # (documented in OPTIMIZATION_r08.md).
        .config(
            "spark.sql.files.openCostInBytes",
            os.environ.get("SPARK_SCAN_OPEN_COST", str(2 * 1024 * 1024)),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 5k-row Arrow batches: round-2 sweep (best-of-2 at sf0.1) measured
        # 5000/96-partitions ~20% faster than round 1's 10000/64 — smaller
        # batches pipeline better against the Zipf-skew stragglers
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "5000")
        # snappy shuffle/broadcast compression: round-4 interleaved A/B on
        # the salted text shuffle measured snappy ~20% faster than the lz4
        # default and zstd ~2x slower (CPU-bound compressor on compressible
        # text; also unifies with the parquet codec)
        .config("spark.io.compression.codec", "snappy")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # catalog tables (register_section_tables) land here in local
        # mode; a real deployment points this at the warehouse/Glue
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/idp-spark-warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def stop_spark() -> None:
    s = SparkSession.getActiveSession()
    if s is not None:
        s.stop()
