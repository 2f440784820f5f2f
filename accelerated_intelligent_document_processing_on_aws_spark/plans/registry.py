"""Unified query registry for the driver contract.

``QUERIES[name]`` — callable (spark, sf_dir) → DataFrame.
``ORACLES[name]`` — DuckDB ANSI SQL (absent for non-SQL-expressible
operators, which the driver checks rows-only).
"""

from __future__ import annotations

from . import analytics, corpus_queries, parity_queries, pipeline_queries

QUERIES: dict = {}
ORACLES: dict = {}

for module in (analytics, corpus_queries, parity_queries, pipeline_queries):
    for name, (fn, sql) in module.ENTRIES.items():
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name}")
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = " ".join(sql.split())
