"""Vector column expressions over ``array<float|double>`` embeddings.

Cosine similarity as a pure Catalyst expression (``zip_with`` dot
product + ``aggregate`` norms) — the reference computes the same
dot/(‖a‖‖b‖) in Python (``evaluation/comparator.py:388-419``); here it
stays JVM-side and vectorizes under whole-stage codegen, which is what
makes brute-force similarity search viable at scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, _dot(a, b) / denom).otherwise(F.lit(0.0))
