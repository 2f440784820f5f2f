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

# Round-7 FRONT (r6 verdict item 2 — evidence-age rotation).  50 slots:
#   [0]      the new round-7 rows-only query: the PREBUILT-index IVF
#            serving shape (r6 verdict item 3 — the driver now
#            exercises the amortized shape the 10^12-vector story
#            depends on, not only the inline one);
#   [1..42]  the 42 oracle-paired queries whose latest driver evidence
#            is r4 (oldest cohort, oldest-first) — after r7 no
#            oracle-paired query's evidence is older than r5;
#   [43..49] the remaining new oracle-paired queries and 3 of the 12
#            rows-only entries, prioritizing the dedup/ANN operators
#            (the other 9 rows-only checks stay pytest-gated e2e and
#            rotate in next round).
FRONT_R7_NEW = [
    "ann_ivf_prebuilt_topk",
    "q8_market_share",
    "q9_nation_profit",
    "q16_supplier_cnt",
    "q20_excess_suppliers",
    # late-round-7 additions: Q2/Q11 over the deterministically
    # derived partsupp bridge (TPC-H battery now 22/22) and the
    # temperature-balanced language-mixing sampler.  The three
    # rows-only re-presents made room (they stay pytest-gated and
    # rotate back in r8).
    "q2_min_cost_supplier",
    "q11_important_stock",
    "temperature_mix_sample",
]

FRONT_STALE_R4 = [
    "compare_exact_normalized",
    "compare_numeric_currency",
    "fuzzy_levenshtein_pairs",
    "evaluation_prf_metrics",
    "embedding_cosine_pairs",
    "dedup_exact_groups",
    "ngram_jaccard_block_pairs",
    "fingerprint_md5_docs",
    "kgram_min_fingerprint_docs",
    "token_counts",
    "lang_id_pred",
    "quality_scores",
    "ann_bruteforce_topk",
    "json_extract_field",
    "q7_nation_volume",
    "q10_returned_items",
    "q14_promo_share",
    "q17_small_quantity",
    "hll_sketch_merge_shards",
    "pq_encode_literal",
    "array_functions_battery",
    "except_intersect_shards",
    "salted_join_hot_key",
    "rolling_range_window",
    "upsert_latest_events",
    "duplicate_ngram_spans",
    "length_histogram",
    "approx_percentile_bounds",
    "paragraph_dedup_docs",
    "q4_priority_late_exists",
    "q6_forecast_revenue",
    "q12_returnflag_case_buckets",
    "q13_custdist",
    "q15_top_supplier",
    "q19_disjunctive_predicates",
    "q22_idle_customers",
    "approx_distinct_hll",
    "grouping_sets_metrics",
    "layout_tables_cells",
    "layout_forms_kv",
    "layout_table_markdown",
    "text_confidence_table",
]

FRONT_ROWS_ONLY_R7: list = []

# Round-8 rotation queue (added late in round 7, registered BEHIND the
# frozen r7 FRONT so the 50-slot rotation plan stayed intact): the five
# new oracle-paired entries `exact_substring_dedup_docs`,
# `exact_substring_keepfirst_docs`, `unigram_logppl_docs`,
# `containment_quote_pairs`, `bloom_incremental_dedup_docs` plus the
# rows-only `semantic_dedup_keep`, and the three rows-only re-presents
# deferred from r7 — all go to the TOP of the r8 FRONT, then refresh by
# evidence age (post-r7 the oldest oracle-paired cohort is r5).
FRONT = FRONT_R7_NEW + FRONT_STALE_R4 + FRONT_ROWS_ONLY_R7

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
