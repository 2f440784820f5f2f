"""Iceberg table format switch.

The engine's contract (BASELINE input hint) is an Iceberg table of
transcripts; this sandbox has no Iceberg runtime jar, so the format is
a config switch with a parquet fallback that preserves the SAME
semantics the engine relies on:

| Iceberg feature            | parquet fallback                         |
|---|---|
| snapshot isolation/resume  | bucket-dir manifest (`sources.checkpoint`)|
| partition spec (days(ts))  | `partitionBy("date")` directory layout   |
| dynamic partition overwrite| per-bucket dir replace before append     |
| catalog table names        | path-addressed tables                    |

On a cluster with `iceberg-spark-runtime` on the classpath and a
catalog configured (e.g. ``spark.sql.catalog.lake=org.apache.iceberg
.spark.SparkCatalog``), pass ``fmt="iceberg"`` and table identifiers
instead of paths — no operator changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, location: str, fmt: str = "auto") -> DataFrame:
    if fmt == "iceberg" or (fmt == "auto" and "/" not in location):
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath; add "
                "iceberg-spark-runtime and a catalog config, or use "
                "fmt='parquet' with a path"
            )
        return spark.read.format("iceberg").load(location)
    return spark.read.parquet(location)


def write_table(
    df: DataFrame,
    location: str,
    fmt: str = "auto",
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    spark = df.sparkSession
    if fmt == "iceberg" or (fmt == "auto" and "/" not in location):
        if not iceberg_available(spark):
            raise RuntimeError("Iceberg runtime not on the classpath")
        w = df.writeTo(location)
        if mode == "append":
            w.append()
        else:
            w.createOrReplace()
        return
    w = df.write.mode(mode).option("compression", "snappy")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(location)
