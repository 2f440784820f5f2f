"""Normalization column expressions — JVM-side, whole-stage-codegen'd.

Reimplements the reference's value normalizers as Catalyst expressions
(no Python in the hot path):

- text: strip punctuation, collapse whitespace, lowercase
  (``lib/idp_common_pkg/idp_common/evaluation/comparator.py:100-115``).
- numeric: strip currency symbols/commas/parens then cast double
  (``comparator.py:118-140``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def norm_text(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    stripped = F.regexp_replace(c, r"[^\w\s]", "")
    collapsed = F.trim(F.regexp_replace(stripped, r"\s+", " "))
    return F.lower(collapsed)


def norm_numeric(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    # try_cast: non-numeric → null (ANSI-safe), mirroring the reference's
    # ValueError fallback (comparator.py:136-140).
    return F.regexp_replace(c.cast("string"), r"[$,()\s]", "").try_cast("double")
