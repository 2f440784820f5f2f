"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``   — flagship: the full extraction pipeline (kernel →
                     segmentation → per-class section stats) over the
                     sf0.001 fixtures.
``queries()``      — every implemented operator from SURVEY.md §2 as a
                     (spark, sf_dir) → DataFrame callable.
``oracle_sql()``   — DuckDB ANSI-SQL twins for the SQL-expressible
                     entries; kernel / engine-hash operators are
                     rows-only by design (their correctness gate is the
                     pytest byte-equality suite vs the pure-Python
                     oracle).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: run the main-content extraction engine end-to-end.

    Documents are mapped into the transcript shape (conversation =
    source feed, turn = document ordered by doc_id), pushed through the
    extraction kernel and BIO segmentation, and summarized per class.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from accelerated_intelligent_document_processing_on_aws_spark.operators import (
        segmentation as seg,
    )
    from accelerated_intelligent_document_processing_on_aws_spark.operators.extract import (
        extract_turns,
    )

    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    w = Window.partitionBy("source").orderBy("doc_id")
    transcripts = docs.select(
        F.col("source").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
    )
    extracted = extract_turns(transcripts, salt=4)
    sections = seg.sections(extracted, "llm_determined")
    # per-(source, class) section stats: one row per source feed gives the
    # smoke check a real result set, not a single aggregate row
    return (
        sections.groupBy(F.col("conv_id").alias("source"), "classification")
        .agg(
            F.count(F.lit(1)).alias("n_sections"),
            F.sum("n_turns").alias("n_turns"),
            F.round(F.avg("confidence"), 4).alias("avg_confidence"),
        )
        .orderBy("source", "classification")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from accelerated_intelligent_document_processing_on_aws_spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from accelerated_intelligent_document_processing_on_aws_spark.plans import ORACLES

    return dict(ORACLES)
