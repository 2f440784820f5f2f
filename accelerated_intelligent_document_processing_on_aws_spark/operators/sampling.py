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


def pack_token_windows(
    df: DataFrame,
    order_col: str,
    token_col: str,
    window_tokens: int,
    part_col: str | None = None,
) -> DataFrame:
    """Sequence packing: assign documents, in deterministic ``order_col``
    order (optionally within ``part_col`` groups), to training context
    windows of ~``window_tokens`` tokens.

    ``window_id = floor(exclusive_running_token_sum / window_tokens)`` —
    the streaming-friendly approximation of first-fit packing: a
    document starts in the window its predecessors filled up to, and an
    over-long document spills into the next id rather than being split.
    One window shuffle, no UDF."""
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
