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

# Round-6 FRONT (r5 verdict item 2 — evidence-age rotation).  50 slots:
#   [0]      the new round-6 oracle-paired query (keep-representative
#            finally gets a driver-level correctness row — verdict
#            item 3);
#   [1..49]  the 49 oracle-paired queries whose latest driver evidence
#            is r3 (oldest-first per the verdict's list) — after r6 no
#            oracle-paired query's evidence is older than r4.
FRONT_R6_NEW = [
    "dedup_keep_representative_docs",
]

FRONT_STALE_R3 = [
    "paginate_lines",
    "rule_validation_summary",
    "curation_pipeline_stats",
    "sections_bio_events",
    "image_decode_stats",
    "semantic_cosine_eval",
    "eval_rollup_docs",
    "split_eval_metrics",
    "page_classification_accuracy_events",
    "payload_kind_sniff",
    "asof_join_events_chunked",
    "audio_decode_stats",
    "q18_large_orders",
    "q21_waiting_supplier",
    "zorder_keys",
    "percentile_scores",
    "session_window_agg",
    "variant_props_rollup",
    "gopher_quality_flags",
    "repetition_stats_docs",
    "pii_scrub_docs",
    "blocklist_fraction_docs",
    "decontaminate_train_docs",
    "tfidf_top_terms",
    "section_text_events",
    "single_class_sections_events",
    "name_regex_fastpath",
    "limited_vote_propagate",
    "sections_page_events",
    "asof_join_events",
    "range_join_windows",
    "alerts_per_class_threshold",
    "stickler_config_eval",
    "judge_rule_cascade",
    "hungarian_list_compare",
    "hash_split_conversations",
    "stratified_hash_sample",
    "pack_token_windows",
    "near_dup_clusters",
    "training_data_pipeline",
    "multimodal_features",
    "excel_sheet_pages",
    "word_elements_docs",
    "string_to_list_coercion",
    "empty_schema_skip",
    "flatten_dot_notation",
    "discover_class_attributes",
    "json_repair_ragged",
    "json_yaml_detect",
]

FRONT = FRONT_R6_NEW + FRONT_STALE_R3

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
