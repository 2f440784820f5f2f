"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Both are compositions of existing DataFrame operators (the preferred
implementation tier for custom operators — no UDF, no mapPartitions):

- **as-of join**: each left row picks the latest right row at-or-before
  its timestamp within a key.  Implemented as the union-sort-window
  pattern: tag both sides, sort by (key, time, side), carry the last
  seen right values forward with an ignore-nulls ``last`` window, keep
  left rows.  ONE shuffle on the key — the same cost as a regular
  co-partitioned join, regardless of how far back matches reach.
- **range join**: right rows falling inside left [start, end]
  intervals.  A naive inequality join degenerates to per-key
  cross-products; bucketizing both sides onto a time grid turns it into
  an equi-join on (key, bucket) + an exact containment filter, so work
  scales with interval length / bucket, not with row-count².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: for each left row, the most recent right row
    with ``right.on <= left.on`` (backward, inclusive) sharing ``by``.

    Right must be unique per (by, on) — pre-aggregate ties first, since
    "the latest row" is ill-defined among exact duplicates.  Returns all
    left columns plus ``value_cols`` from the matched right row (null
    when nothing precedes).  ``direction='forward'`` matches the
    earliest right row at-or-after instead."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    lcols = left.columns
    tagged_l = left.select(
        *lcols,
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    tagged_r = right.select(
        *[
            F.col(c) if c in (by + [on]) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    u = tagged_l.unionByName(tagged_r)
    if direction == "backward":
        # right rows sort BEFORE left rows at equal time → inclusive match
        w = (
            Window.partitionBy(*by)
            .orderBy(F.asc(on), F.asc("_is_left"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.desc(on), F.asc("_is_left"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    carried = u.select(
        *lcols,
        "_is_left",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
            for c in value_cols
        ],
    )
    return carried.where(F.col("_is_left") == 1).select(
        *lcols, *[F.col(f"_m_{c}").alias(f"asof_{c}") for c in value_cols]
    )


def range_join(
    intervals: DataFrame,
    points: DataFrame,
    by: list[str],
    start_col: str,
    end_col: str,
    time_col: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Inner join of point rows onto [start, end] interval rows sharing
    ``by``, bucketized: each interval explodes into the time-grid
    buckets it covers, points map to their single bucket, the equi-join
    runs on (by, bucket), and the exact containment predicate filters —
    an interval spanning k buckets costs k join rows instead of a
    per-key cross-product.  Inclusive on both ends."""
    b = F.lit(bucket_seconds)
    ivals = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / b),
                F.floor(F.unix_timestamp(F.col(end_col)) / b),
            )
        ),
    )
    pts = points.withColumn("_bucket", F.floor(F.unix_timestamp(F.col(time_col)) / b))
    return (
        ivals.join(pts, by + ["_bucket"])
        .where(
            (F.col(time_col) >= F.col(start_col)) & (F.col(time_col) <= F.col(end_col))
        )
        .drop("_bucket")
    )
