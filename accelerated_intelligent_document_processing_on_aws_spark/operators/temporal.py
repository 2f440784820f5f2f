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
    chunk_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: for each left row, the most recent right row
    with ``right.on <= left.on`` (backward, inclusive) sharing ``by``.

    Right must be unique per (by, on) — pre-aggregate ties first, since
    "the latest row" is ill-defined among exact duplicates.  Returns all
    left columns plus ``value_cols`` from the matched right row (null
    when nothing precedes).  ``direction='forward'`` matches the
    earliest right row at-or-after instead.

    ``chunk_seconds=None`` (default): the one-shuffle union-sort-window
    form — the window partitions only by ``by``, so one hot key (one
    giant instrument / conversation) serializes into a single task.
    ``chunk_seconds=k``: the skew-hardened two-pass form — the carry
    window partitions by (``by``, time-chunk), a per-chunk summary
    spine (ONE row per chunk) propagates the carry across chunks, and
    each left row coalesces its in-chunk match with the previous
    chunks' carry.  A hot key now parallelizes across its time range;
    the serialized window runs only over the tiny spine.  Costs one
    extra (small) shuffle + a broadcast-or-shuffle join back."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    # null-timestamp semantics (round 3, explicit instead of ambient
    # null-sort order): a right row with NULL `on` can never be "the
    # most recent at time t" — dropped; a left row with NULL `on` has
    # no defined as-of point — passes through with NULL match columns
    # (matching DuckDB/pandas ASOF null behavior).
    null_left = left.where(F.col(on).isNull()).select(
        "*", *[F.lit(None).cast(right.schema[c].dataType).alias(f"asof_{c}") for c in value_cols]
    )
    left = left.where(F.col(on).isNotNull())
    right = right.where(F.col(on).isNotNull())
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
    backward = direction == "backward"
    if chunk_seconds is None:
        if backward:
            # right rows sort BEFORE left rows at equal time → inclusive
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
        matched = carried.where(F.col("_is_left") == 1).select(
            *lcols, *[F.col(f"_m_{c}").alias(f"asof_{c}") for c in value_cols]
        )
        return matched.unionByName(null_left)
    return _asof_join_chunked(
        u, on, by, value_cols, lcols, backward, chunk_seconds
    ).unionByName(null_left)


def _asof_join_chunked(
    u: DataFrame,
    on: str,
    by: list[str],
    value_cols: list[str],
    lcols: list[str],
    backward: bool,
    chunk_seconds: int,
) -> DataFrame:
    """Two-pass segmented-scan as-of: in-chunk carry in parallel, then
    cross-chunk carry over a one-row-per-chunk spine."""
    # chunk ids flip sign for forward so "preceding chunks" is always
    # ascending _chunk order
    raw_chunk = F.floor(F.unix_timestamp(F.col(on)) / F.lit(chunk_seconds))
    u = u.withColumn("_chunk", raw_chunk if backward else -raw_chunk)
    time_order = (
        [F.asc(on), F.asc("_is_left")] if backward else [F.desc(on), F.asc("_is_left")]
    )
    w1 = (
        Window.partitionBy(*by, "_chunk")
        .orderBy(*time_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_chunk = u.select(
        *lcols,
        "_is_left",
        "_chunk",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w1).alias(f"_m_{c}")
            for c in value_cols
        ],
        *[F.col(f"_r_{c}") for c in value_cols],
    )
    # spine: per (by, chunk) the LAST right value in chunk order —
    # max(struct(on, ...)) picks it without a second sort (backward);
    # forward uses min(struct) = the earliest
    pick = F.max if backward else F.min
    chunk_last = (
        in_chunk.where(F.col("_is_left") == 0)
        .groupBy(*by, "_chunk")
        .agg(
            pick(
                F.struct(F.col(on), *[F.col(f"_r_{c}").alias(f"_r_{c}") for c in value_cols])
            ).alias("_pick")
        )
        .select(*by, "_chunk", *[F.col(f"_pick._r_{c}").alias(f"_cl_{c}") for c in value_cols])
    )
    # full chunk spine (left chunks with no right rows still need carry)
    spine = in_chunk.select(*by, "_chunk").distinct()
    w_spine = (
        Window.partitionBy(*by)
        .orderBy(F.asc("_chunk"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_prev = (
        spine.join(chunk_last, by + ["_chunk"], "left")
        .select(
            *by,
            "_chunk",
            *[
                F.last(f"_cl_{c}", ignorenulls=True).over(w_spine).alias(f"_cp_{c}")
                for c in value_cols
            ],
        )
    )
    joined = in_chunk.where(F.col("_is_left") == 1).join(
        carry_prev, by + ["_chunk"], "left"
    )
    return joined.select(
        *lcols,
        *[
            F.coalesce(F.col(f"_m_{c}"), F.col(f"_cp_{c}")).alias(f"asof_{c}")
            for c in value_cols
        ],
    )


def range_join(
    intervals: DataFrame,
    points: DataFrame,
    by: list[str],
    start_col: str,
    end_col: str,
    time_col: str,
    bucket_seconds: int = 3600,
    max_span_buckets: int = 10_000,
) -> DataFrame:
    """Inner join of point rows onto [start, end] interval rows sharing
    ``by``, bucketized: each interval explodes into the time-grid
    buckets it covers, points map to their single bucket, the equi-join
    runs on (by, bucket), and the exact containment predicate filters —
    an interval spanning k buckets costs k join rows instead of a
    per-key cross-product.  Inclusive on both ends.

    Guards (round 3): a reversed interval (end < start) explodes to
    zero rows instead of a descending garbage sequence, and an interval
    spanning more than ``max_span_buckets`` grid cells FAILS the task
    loudly — a multi-year interval on an hour grid is a data bug or a
    mis-sized ``bucket_seconds``, and silently exploding it row-bombs
    the join."""
    b = F.lit(bucket_seconds)
    lo = F.floor(F.unix_timestamp(F.col(start_col)) / b)
    hi = F.floor(F.unix_timestamp(F.col(end_col)) / b)
    span_ok = F.assert_true(
        hi - lo < F.lit(max_span_buckets),
        F.concat(
            F.lit("range_join interval spans too many grid buckets (> "),
            F.lit(str(max_span_buckets)),
            F.lit("): widen bucket_seconds or fix the interval"),
        ),
    )
    ivals = intervals.withColumn(
        "_bucket",
        F.explode(
            F.when(span_ok.isNull() & (hi >= lo), F.sequence(lo, hi)).otherwise(
                F.array().cast("array<bigint>")
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
