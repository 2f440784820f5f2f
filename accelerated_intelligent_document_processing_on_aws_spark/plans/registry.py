"""Unified query registry for the driver contract.

``QUERIES[name]`` — callable (spark, sf_dir) → DataFrame.
``ORACLES[name]`` — DuckDB ANSI SQL (absent for non-SQL-expressible
operators, which the driver checks rows-only).

Ordering matters: the correctness driver verifies only the FIRST 50
registry entries per round.  Queries that have never received a
driver-level correctness row are therefore listed FIRST (``FRONT``),
followed by queries already proven green in prior driver rounds
(CORRECTNESS_r01/r02), followed by rows-only pipeline checks.  When a
new oracle-paired query is added, its name goes at the top of FRONT.
"""

from __future__ import annotations

from . import analytics, corpus_queries, parity_queries, pipeline_queries

# Oracle-paired queries with no driver-level correctness evidence yet
# (registry positions >= 50 in rounds 1-2), plus everything new this
# round.  These MUST occupy positions 0..len(FRONT)-1.
# Round-5 FRONT (verdict item 2 — finish the evidence rotation and
# clean the ledger).  50 slots total:
#   [0..26]  the 27 oracle-paired queries whose only green rows are
#            r1/r2 (oldest evidence first, per the verdict's list);
#   [27..x]  queries whose implementation changed THIS round (the two
#            md5-sketch fixes) plus new round-5 oracle-paired queries —
#            new names are appended to FRONT_R5_NEW as they land;
#   [tail]   the 12 rows-only entries re-presented so
#            pipeline_sections_bio finally gets a clean
#            (post-_stringify_sections) driver row replacing its
#            r1-era canonicalizer error.
FRONT_STALE_R1R2 = [
    "star_join_regional_sales",
    "supplier_lineitem_rollup",
    "topk_customers_by_spend",
    "union_shards",
    "join_avg_by_segment",
    "gaps_islands_sessions",
    "sessionize_time_gap",
    "price_vs_global_avg",
    "agg_discipline_max_per_doc",
    "conditional_agg_pivot",
    "confidence_band_accuracy",
    "count_distinct_filtered",
    "date_functions",
    "string_functions",
    "ratio_by_priority",
    "semi_join_active",
    "sum_by_context",
    "cost_model_broadcast",
    "anti_join_resume",
    "sequence_explode_ranges",
    "majority_vote_mode",
    "min_normalized_index",
    "window_lag_lead",
    "row_number_ordinals",
    "chunk_counts",
    "summarize_head_tokens",
    "csv_markdown_rows",
]

# Implementations touched in round 5 → must be re-presented even though
# they carry green r4 rows (shingle guard / empty-doc pin).
FRONT_R5_CHANGED = [
    "minhash_md5_signature",
    "simhash_md5_fingerprint",
    # sf0.1 sweep catch: err was silently computed against the ROUNDED
    # scale via same-select alias shadowing; fixed + must re-verify
    "embedding_int8_quantization",
]

# New round-5 oracle-paired queries: append here as they are added.
FRONT_R5_NEW = [
    "paragraph_dedup_groupby_docs",
    "split_leakage_exact",
    "intra_doc_line_dedup",
]

# Rows-only re-presentation block — MUST stay exactly 12 names and sit
# at the FRONT tail (driver slots 38..49 when the middle blocks fill).
FRONT_ROWS_ONLY_TAIL = [
    "pipeline_extract_turns",
    "pipeline_sections_bio",
    "pipeline_sections_majority",
    "pipeline_lineage",
    "pipeline_confidence_alerts",
    "pipeline_section_text",
    "minhash_lsh_near_dup",
    "simhash_near_dup",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_pq_rerank_topk",
    "pipeline_evaluation_report",
]

FRONT = (
    FRONT_STALE_R1R2 + FRONT_R5_CHANGED + FRONT_R5_NEW + FRONT_ROWS_ONLY_TAIL
)

_ALL: dict = {}
_ORACLE_SQL: dict = {}

for module in (analytics, corpus_queries, parity_queries, pipeline_queries):
    for name, (fn, sql) in module.ENTRIES.items():
        if name in _ALL:
            raise ValueError(f"duplicate query name {name}")
        _ALL[name] = fn
        if sql is not None:
            _ORACLE_SQL[name] = " ".join(sql.split())

_missing = [n for n in FRONT if n not in _ALL]
if _missing:
    raise ValueError(f"FRONT names not registered: {_missing}")

QUERIES: dict = {}
ORACLES: dict = {}

# FRONT first (all oracle-paired), then remaining oracle-paired in
# module order, then rows-only checks last.
_rest = [n for n in _ALL if n not in FRONT]
_order = FRONT + [n for n in _rest if n in _ORACLE_SQL] + [
    n for n in _rest if n not in _ORACLE_SQL
]
for name in _order:
    QUERIES[name] = _ALL[name]
    if name in _ORACLE_SQL:
        ORACLES[name] = _ORACLE_SQL[name]
