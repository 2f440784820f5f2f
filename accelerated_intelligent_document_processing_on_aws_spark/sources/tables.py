"""Table IO.

The driver's TPC-H-ish fixtures live one-parquet-per-table under an
``sf_dir``; transcript corpora are single parquet files produced by
``fixtures.transcripts``.  In production these reads become Iceberg
table scans (``spark.read.format("iceberg").load(...)``) — the format
is a config switch, not an architecture change; Catalyst pushes filters
and prunes columns/partitions identically for both.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_testdata(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for Spark SQL plans."""
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
