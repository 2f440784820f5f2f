"""Deterministic sampling / splitting / packing for training-data prep.

The property these share: decisions derive from a CONTENT/KEY hash, not
an RNG — so they are reproducible across runs, engines (md5 is the one
cross-engine digest), partitionings, and corpus growth.  A document
keeps its train/test assignment forever, which `df.sample()` cannot
promise as the corpus changes; an auditor can recompute any decision
from the row alone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HASH_SPACE = float(16**8)


def hash_uniform(col: Column) -> Column:
    """Deterministic uniform [0, 1) from the md5 of a key: first 8 hex
    chars parsed as an integer over 16^8.  Engine-independent (any SQL
    engine with md5 reproduces the exact value)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")
        / F.lit(_HASH_SPACE)
    )


def hash_split(df: DataFrame, key_col: str, weights: dict[str, float]) -> DataFrame:
    """Deterministic dataset split (train/val/test) by key hash.

    ``weights`` maps split name → fraction (must sum to ~1; insertion
    order defines the hash-interval layout).  Adds a ``split`` column.
    Rows sharing a key land in the same split — pass conv_id to keep
    whole conversations un-leaked across train/test."""
    u = hash_uniform(F.col(key_col))
    names = list(weights)
    expr = None
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name]
        expr = (
            F.when(u < acc, name) if expr is None else expr.when(u < acc, name)
        )
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def stratified_hash_sample(
    df: DataFrame, key_col: str, strata_col: str, fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its key hash
    falls below its stratum's fraction (unlisted strata use the
    default).  The scalable analog of ``sampleBy`` with a reproducibility
    guarantee that survives reruns and engine changes."""
    u = hash_uniform(F.col(key_col))
    frac = F.lit(default_fraction)
    for name, f in fractions.items():
        frac = F.when(F.col(strata_col) == name, f).otherwise(frac)
    return df.where(u < frac)


def temperature_mix_sample(
    df: DataFrame,
    key_col: str,
    group_col: str,
    target_fraction: float = 0.5,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-balanced group mixing — the multilingual-pretraining
    rebalance (mBERT/XLM-R style): per-group sampling rates are made
    proportional to ``n_g^alpha`` instead of ``n_g``, so low-resource
    groups are UPSAMPLED relative to their corpus share while the
    overall kept fraction targets ``target_fraction``::

        rate_g = min(1, target_fraction * total * n_g^alpha
                        / sum(n^alpha) / n_g)

    A row is kept iff its key's :func:`hash_uniform` < ``rate_g`` — the
    same audit-from-the-row-alone determinism as the other samplers.
    The default ``alpha=0.5`` uses ``sqrt``, which IEEE-754 requires to
    be correctly rounded in every engine; the rate is additionally
    quantized to 6dp so the float ``sum(sqrt(n))`` denominator's
    accumulation-order ulp can never flip a keep decision across
    engines or partitionings.

    Plan shape: one dim-sized group count, a broadcast 1-row total,
    and a broadcast rate join back — the corpus is scanned once, with
    zero wide shuffles beyond the group-count aggregate."""
    powf = F.sqrt if alpha == 0.5 else (lambda c: F.pow(c, F.lit(alpha)))
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    tot = counts.agg(
        F.sum("_n").alias("_total"), F.sum(powf(F.col("_n"))).alias("_denom")
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        group_col,
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(target_fraction)
                * F.col("_total")
                * powf(F.col("_n"))
                / F.col("_denom")
                / F.col("_n"),
            ),
            6,
        ).alias("_rate"),
    )
    u = hash_uniform(F.col(key_col))
    return df.join(F.broadcast(rates), group_col).where(u < F.col("_rate")).drop(
        "_rate"
    )


def pack_token_windows(
    df: DataFrame,
    order_col: str,
    token_col: str,
    window_tokens: int,
    part_col: str | None = None,
    range_partitions: int | None = None,
) -> DataFrame:
    """Sequence packing: assign documents, in deterministic ``order_col``
    order (optionally within ``part_col`` groups), to training context
    windows of ~``window_tokens`` tokens.

    ``window_id = floor(exclusive_running_token_sum / window_tokens)`` —
    the streaming-friendly approximation of first-fit packing: a
    document starts in the window its predecessors filled up to, and an
    over-long document spills into the next id rather than being split.

    Without ``part_col`` the running sum is GLOBAL, and a bare
    ``Window.orderBy`` funnels the whole corpus through one task — fine
    locally, fatal at 10^9 docs.  ``range_partitions=N`` switches to the
    two-pass segmented form: range-partition on ``order_col``, compute
    the prefix sum within each range in parallel, then add each range's
    cumulative offset from a tiny N-row table (broadcast join).  Same
    result (``order_col`` must be a total order), scale-shaped."""
    if part_col is None and range_partitions:
        return _pack_token_windows_ranged(
            df, order_col, token_col, window_tokens, range_partitions
        )
    keys = [part_col] if part_col else []
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_col).over(w) - F.col(token_col)  # exclusive prefix sum
    return df.withColumn(
        "window_id", F.floor(cum / F.lit(window_tokens)).cast("int")
    )


def _pack_token_windows_ranged(
    df: DataFrame,
    order_col: str,
    token_col: str,
    window_tokens: int,
    range_partitions: int,
) -> DataFrame:
    """Two-pass global prefix sum: range-partition → in-range window →
    per-range offsets (running sum over an N-row frame) → broadcast
    join.  The only serialized step touches ``range_partitions`` rows."""
    ranged = df.repartitionByRange(range_partitions, F.col(order_col)).withColumn(
        "_rid", F.spark_partition_id()
    )
    w_in = (
        Window.partitionBy("_rid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = ranged.withColumn("_incl", F.sum(token_col).over(w_in))
    # per-range totals → exclusive running offsets; the window frame here
    # is range_partitions rows — trivially single-task by construction
    w_off = (
        Window.orderBy("_rid").rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        within.groupBy("_rid")
        .agg(F.sum(token_col).alias("_total"))
        .select(
            "_rid",
            F.coalesce(F.sum("_total").over(w_off), F.lit(0)).alias("_offset"),
        )
    )
    excl = F.col("_offset") + F.col("_incl") - F.col(token_col)
    return (
        within.join(F.broadcast(offsets), "_rid")
        .withColumn("window_id", F.floor(excl / F.lit(window_tokens)).cast("int"))
        .drop("_rid", "_incl", "_offset")
    )
