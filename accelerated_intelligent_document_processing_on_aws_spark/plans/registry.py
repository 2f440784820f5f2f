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
FRONT = [
    # round-4 slot 0: the one red row of round 3 (array<tinyint> column
    # crashed the driver canonicalizer; now CSV-stringified both sides)
    "embedding_int8_quantization",
    # round-4 battery: remaining TPC-H shapes over this fixture schema,
    # HLL sketch with a checked error bound, explicit GROUPING SETS,
    # C4 cross-document paragraph dedup, duplicated n-gram spans,
    # length histogram, approx-percentile with checked rank bound
    "hll_sketch_merge_shards",
    "minhash_md5_signature",
    "simhash_md5_fingerprint",
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
    # round-4 additions: layout tables/forms lift + text-confidence
    # parity twin (verdict items 5 and 7)
    "layout_tables_cells",
    "layout_forms_kv",
    "layout_table_markdown",
    "text_confidence_table",
    # --- regression re-verification (verdict item 2): every remaining
    # query already has a green row, but the evidence below predates the
    # round-3 rewrites of its implementation files — ordered
    # most-rewritten-first (dedup/similarity/textstats/evaluation/
    # json_extract, then the analytics tuning), oldest-evidence-first.
    "dedup_exact_groups",
    "ngram_jaccard_block_pairs",
    "ann_bruteforce_topk",
    "embedding_cosine_pairs",
    "token_counts",
    "lang_id_pred",
    "quality_scores",
    "fingerprint_md5_docs",
    "kgram_min_fingerprint_docs",
    "compare_exact_normalized",
    "compare_numeric_currency",
    "evaluation_prf_metrics",
    "fuzzy_levenshtein_pairs",
    "json_extract_field",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_volume",
    "q7_nation_volume",
    "q10_returned_items",
    "q14_promo_share",
    "q17_small_quantity",
    "rollup_sales",
    "cube_order_stats",
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
]

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
