"""Explicit skew-join utilities for hot keys beyond AQE's reach.

AQE's skew-join split (``spark.sql.adaptive.skewJoin``) only fires on
sort-merge joins whose post-shuffle partition stats reveal the skew.
For a KNOWN hot key distribution (one conv_id with 10^9 turns joined
against per-conversation metadata), pre-salting is deterministic, plans
identically at any scale, and also covers broadcast-ineligible
medium-size right sides.  Analog of the reference's DynamoDB
hot-partition sharding note (``docs/troubleshooting.md``).

Semantics: ``salted_join(left, right, key, salt)`` == ``left.join(
right, key, how)`` exactly — verified by the equivalence test — for
``how`` in (inner, left).  The left side's rows spread across ``salt``
sub-keys via a deterministic hash of the whole row (no ``rand()``: a
retried task must re-salt identically or shuffle retries double rows);
the right side replicates each row ``salt`` times via ``explode``.
Right-side blowup is ``salt × |right|`` — use for |right| ≪ |left|,
which is the skew scenario by definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join on ``key`` with the left side salted into ``salt`` sub-keys.

    Deterministic under retries: the sub-key is a hash of the left
    row's columns, never ``rand()``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how}")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    lcols = [F.col(c) for c in left.columns]
    l = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*lcols), F.lit(salt)).cast("int")
    )
    r = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l.join(r, [key, "_salt"], how)
    return out.drop("_salt")
