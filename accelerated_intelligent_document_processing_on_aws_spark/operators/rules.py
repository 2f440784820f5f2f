"""Deterministic rule validation over extracted records.

Analog of the reference's rule-validation stage
(``lib/idp_common_pkg/idp_common/rule_validation/service.py``), which
runs configured checks against each section's extracted attributes and
emits pass/fail results.  The LLM-judged rules become deterministic
rule kinds; each rule is a Catalyst expression, so the whole rulebook
evaluates in one codegen'd pass with zero UDFs:

- ``required``   — value present and non-blank
- ``regex``      — value matches a pattern
- ``range``      — numeric value within [lo, hi]
- ``one_of``     — value in an allowed set
- ``max_length`` — string length bound

Rules are data (a small config list), mirroring the reference's
config-driven rulebook; the output is a long-format violations table
(one row per rule × record), date-partitionable like the reporting
layer.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Rule:
    name: str
    column: str
    kind: str  # required | regex | range | one_of | max_length
    pattern: str | None = None
    lo: float | None = None
    hi: float | None = None
    allowed: list[str] = field(default_factory=list)
    max_len: int | None = None


def _passes(rule: Rule) -> Column:
    c = F.col(rule.column)
    if rule.kind == "required":
        return c.isNotNull() & (F.trim(c.cast("string")) != "")
    if rule.kind == "regex":
        return c.isNotNull() & c.cast("string").rlike(rule.pattern)
    if rule.kind == "range":
        n = c.cast("string").try_cast("double")
        return n.isNotNull() & (n >= rule.lo) & (n <= rule.hi)
    if rule.kind == "one_of":
        return c.isin(rule.allowed)
    if rule.kind == "max_length":
        return c.isNotNull() & (F.length(c.cast("string")) <= rule.max_len)
    raise ValueError(f"unknown rule kind {rule.kind!r}")


def validate(df: DataFrame, rules: list[Rule], id_cols: list[str]) -> DataFrame:
    """Long-format results: (ids..., rule_name, column, kind, passed)."""
    out = None
    for r in rules:
        one = df.select(
            *id_cols,
            F.lit(r.name).alias("rule_name"),
            F.lit(r.column).alias("column"),
            F.lit(r.kind).alias("kind"),
            F.coalesce(_passes(r), F.lit(False)).alias("passed"),
        )
        out = one if out is None else out.unionByName(one)
    return out


def violations(df: DataFrame, rules: list[Rule], id_cols: list[str]) -> DataFrame:
    return validate(df, rules, id_cols).where(~F.col("passed"))


def summary(results: DataFrame) -> DataFrame:
    """Per-rule pass rate (the reference reports rule-level verdicts)."""
    return results.groupBy("rule_name", "kind").agg(
        F.count(F.lit(1)).alias("n_checked"),
        F.sum(F.when(F.col("passed"), 1).otherwise(0)).cast("long").alias("n_passed"),
        F.round(F.avg(F.col("passed").cast("double")), 6).alias("pass_rate"),
    )
