"""Evaluation comparators & metric rollups (SURVEY.md §2.D).

Column-expression reimplementations of the reference's comparator
library (``lib/idp_common_pkg/idp_common/evaluation/comparator.py``)
plus the precision/recall/F1 aggregate family
(``evaluation/metrics.py:13-145``) and the attribute→section→document
rollup cascade (``evaluation/service.py:1564-1902``).

Everything except the Hungarian list matcher is a pure Catalyst
expression (whole-stage codegen, no Python).  The Hungarian matcher is
inherently per-pair quadratic, so it runs as an Arrow-batched pandas
UDF over two array columns — never a row-at-a-time Python UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..functions.normalize import norm_numeric, norm_text
from ..functions.vectors import cosine_sim

DEFAULT_FUZZY_THRESHOLD = 0.8  # comparator.py:315 default


# ---------------------------------------------------------------------------
# scalar comparators (column expressions)
# ---------------------------------------------------------------------------

def _both_empty(a: Column, b: Column) -> Column:
    ea = a.isNull() | (F.trim(a.cast("string")) == "")
    eb = b.isNull() | (F.trim(b.cast("string")) == "")
    return ea & eb


def compare_exact(a: Column, b: Column) -> Column:
    """Normalized string equality; both-None/both-empty → match
    (``comparator.py:143-172``)."""
    na = F.coalesce(norm_text(a), F.lit(""))
    nb = F.coalesce(norm_text(b), F.lit(""))
    return F.when(_both_empty(a, b), F.lit(True)).otherwise(na == nb)


def compare_numeric(a: Column, b: Column) -> Column:
    """Currency-normalized numeric equality, falling back to exact
    (``comparator.py:175-207``)."""
    na, nb = norm_numeric(a), norm_numeric(b)
    return F.when(_both_empty(a, b), F.lit(True)).otherwise(
        F.when(na.isNotNull() & nb.isNotNull(), na == nb).otherwise(
            compare_exact(a, b)
        )
    )


def fuzzy_score(a: Column, b: Column) -> Column:
    """Levenshtein similarity 1 - dist/max_len on normalized strings,
    via the BUILT-IN ``levenshtein`` (JVM) — the reference's O(mn)
    Python DP (``comparator.py:306-345``) without leaving codegen."""
    na = F.coalesce(norm_text(a), F.lit(""))
    nb = F.coalesce(norm_text(b), F.lit(""))
    maxlen = F.greatest(F.length(na), F.length(nb))
    return (
        F.when(_both_empty(a, b), F.lit(1.0))
        .when((F.length(na) == 0) | (F.length(nb) == 0), F.lit(0.0))
        .otherwise(1.0 - F.levenshtein(na, nb) / maxlen)
    )


def _thr(threshold: float | Column) -> Column:
    return threshold if isinstance(threshold, Column) else F.lit(threshold)


def compare_fuzzy(a: Column, b: Column, threshold: float | Column = DEFAULT_FUZZY_THRESHOLD) -> Column:
    return fuzzy_score(a, b) >= _thr(threshold)


def hashed_ngram_embedding(col: Column, n: int = 3, dim: int = 16) -> Column:
    """Deterministic hashed char-ngram count embedding (round-3 upgrade
    from the fuzzy surrogate — SURVEY's suggested mapping for the
    reference's Bedrock embedding step, ``comparator.py:422-492``).

    Normalized text → char n-grams → md5-bucketed counts over ``dim``
    dimensions.  Pure Catalyst, and md5 is the one cross-engine digest,
    so any SQL engine reproduces the exact vector — the semantic score
    is auditable from the row alone, like the sampling hashes.
    O(len·dim) comparisons per value: sized for attribute VALUES
    (short strings), not documents."""
    s = norm_text(col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(s) - (n - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: s.substr(i, F.lit(n)))
    buckets = F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long") % dim,
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.size(F.filter(buckets, lambda b: b == d.cast("long"))).cast(
            "double"
        ),
    )


def semantic_score(a: Column, b: Column, n: int = 3, dim: int = 16) -> Column:
    """Cosine over hashed char-ngram embeddings, with the comparator
    edge contract: both-empty → 1.0, one-empty → 0.0."""
    from ..functions.vectors import cosine_sim

    na = F.coalesce(norm_text(a), F.lit(""))
    nb = F.coalesce(norm_text(b), F.lit(""))
    return (
        F.when(_both_empty(a, b), F.lit(1.0))
        .when((F.length(na) == 0) | (F.length(nb) == 0), F.lit(0.0))
        .otherwise(
            cosine_sim(hashed_ngram_embedding(a, n, dim), hashed_ngram_embedding(b, n, dim))
        )
    )


def compare_semantic(a: Column, b: Column, threshold: float | Column = 0.8) -> Column:
    """The reference's embedding comparator (``comparator.py:422-492``):
    embed both values, threshold the cosine.  The reference embeds via
    Bedrock; this engine embeds via the deterministic hashed char-ngram
    vector (:func:`hashed_ngram_embedding`) — same structure (embed →
    cosine ≥ threshold), reproducible in any engine.  Swapping a model
    embedding in changes the vector source, not the contract."""
    return semantic_score(a, b) >= _thr(threshold)


def compare_values(a: Column, b: Column, method: Column,
                   threshold: float | Column = DEFAULT_FUZZY_THRESHOLD) -> Column:
    """Method-dispatched comparison (EXACT/NUMERIC_EXACT/FUZZY/SEMANTIC)
    — the ``compare_values`` dispatcher (``comparator.py:495-593``).
    ``threshold`` may be a Column for per-row (config-driven) thresholds."""
    return (
        F.when(method == "NUMERIC_EXACT", compare_numeric(a, b))
        .when(method == "FUZZY", compare_fuzzy(a, b, threshold))
        .when(method == "SEMANTIC", compare_semantic(a, b, threshold))
        .otherwise(compare_exact(a, b))
    )


def compare_judge(a: Column, b: Column, threshold: float | Column = DEFAULT_FUZZY_THRESHOLD) -> Column:
    """Deterministic stand-in for the LLM judge (``comparator.py:596-833``).

    The reference's judge returns ``{match, score, reason}`` parsed from
    model output (with JSON salvage).  This engine keeps the exact
    output contract but derives the verdict from a rule cascade —
    exact-normalized → numeric → fuzzy-threshold — as a pure Catalyst
    struct (SURVEY §2.D: "keep interface, implement as rule-based
    judge").  Swapping a real model in changes this one expression, not
    the callers."""
    score = fuzzy_score(a, b)
    exact = compare_exact(a, b)
    na, nb = norm_numeric(a), norm_numeric(b)
    numeric = na.isNotNull() & nb.isNotNull() & (na == nb)
    fuzzy_ok = score >= _thr(threshold)
    return F.struct(
        (exact | numeric | fuzzy_ok).alias("match"),
        F.round(
            F.when(exact | numeric, F.lit(1.0)).otherwise(score), 6
        ).alias("score"),
        F.when(exact, F.lit("exact match after normalization"))
        .when(numeric, F.lit("numeric equality after currency normalization"))
        .when(fuzzy_ok, F.lit("fuzzy similarity at or above threshold"))
        .otherwise(F.lit("below similarity threshold"))
        .alias("reason"),
    )


def compare_embedding(a: Column, b: Column, threshold: float = 0.8) -> Column:
    """Cosine ≥ threshold over two array<numeric> columns
    (``comparator.py:388-419``) — pure Catalyst expression."""
    return cosine_sim(a, b) >= F.lit(threshold)


# ---------------------------------------------------------------------------
# Hungarian list comparator (Arrow-batched pandas UDF)
# ---------------------------------------------------------------------------

_HUNGARIAN_RESULT = T.StructType(
    [
        T.StructField("tp", T.IntegerType()),
        T.StructField("fp", T.IntegerType()),
        T.StructField("avg_score", T.DoubleType()),
    ]
)


def hungarian_udf(comparator: str = "EXACT", threshold: float = DEFAULT_FUZZY_THRESHOLD):
    """Build a pandas UDF computing optimal list-vs-list assignment
    (``comparator.py:240-303``) with item comparator EXACT/FUZZY/NUMERIC."""
    from ..kernel.strings import hungarian_compare

    @pandas_udf(_HUNGARIAN_RESULT)
    def _cmp(expected: pd.Series, actual: pd.Series) -> pd.DataFrame:
        out = [
            hungarian_compare(
                list(e) if e is not None else None,
                list(a) if a is not None else None,
                comparator,
                threshold,
            )
            for e, a in zip(expected, actual)
        ]
        return pd.DataFrame(out, columns=["tp", "fp", "avg_score"])

    return _cmp


# ---------------------------------------------------------------------------
# metric aggregates (evaluation/metrics.py:13-145)
# ---------------------------------------------------------------------------

def _safe_div(num: Column, den: Column) -> Column:
    return F.when(den > 0, num / den).otherwise(F.lit(0.0))


def metric_aggs() -> list[Column]:
    """Aggregates over tp/fp/fn/tn count columns → the reference's
    metric family.  Use after ``groupBy`` on pre-summed columns."""
    tp, fp, fn, tn = (F.sum(c).cast("double") for c in ("tp", "fp", "fn", "tn"))
    precision = _safe_div(tp, tp + fp)
    recall = _safe_div(tp, tp + fn)
    f1 = _safe_div(2 * precision * recall, precision + recall)
    accuracy = _safe_div(tp + tn, tp + fp + fn + tn)
    far = _safe_div(fp, fp + tn)  # false alarm rate (metrics.py:96-109)
    fdr = _safe_div(fp, fp + tp)  # false discovery rate (metrics.py:112-125)
    return [
        F.round(precision, 6).alias("precision"),
        F.round(recall, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
        F.round(accuracy, 6).alias("accuracy"),
        F.round(far, 6).alias("false_alarm_rate"),
        F.round(fdr, 6).alias("false_discovery_rate"),
    ]


def attribute_eval(df: DataFrame, expected: str = "expected", actual: str = "actual",
                   method: str = "evaluation_method") -> DataFrame:
    """Per-attribute evaluation rows: matched flag + score, mirroring the
    attribute schema of ``save_reporting_data.py:621-638``.

    Requires columns (expected, actual, evaluation_method, weight)."""
    matched = compare_values(F.col(expected), F.col(actual), F.col(method))
    score = (
        F.when(F.col(method) == "FUZZY", fuzzy_score(F.col(expected), F.col(actual)))
        .otherwise(matched.cast("double"))
    )
    return df.withColumn("matched", matched).withColumn("score", F.round(score, 6))


def configured_attribute_eval(
    pairs: DataFrame,
    config: DataFrame,
    default_method: str = "EXACT",
    default_threshold: float = DEFAULT_FUZZY_THRESHOLD,
    default_weight: float = 1.0,
) -> DataFrame:
    """Config-driven structured compare — the per-class schema semantics
    of the reference's Stickler evaluation (``evaluation/service.py:363-612``).

    ``pairs``  — (…, classification, attribute_name, expected, actual).
    ``config`` — (classification, attribute_name, evaluation_method,
    threshold, weight): one row per configured attribute of each class,
    the analog of the per-class JSON-schema properties with
    ``x-aws-stickler-comparator/threshold/weight`` extensions.

    The config is BROADCAST (a schema table is tiny at any corpus size)
    and left-joined; attributes with no config row get default
    method/threshold/weight and ``auto_configured = true`` — mirroring
    the reference's genson auto-schema for unconfigured fields
    (``service.py:221-264,396-416``).  ``unexpected`` flags fields the
    actual output produced that the expected record does not contain —
    the unexpected-field discovery of the structured compare.
    Output adds (evaluation_method, threshold, weight, auto_configured,
    unexpected, matched, score)."""
    cfg = F.broadcast(
        config.select(
            "classification",
            "attribute_name",
            F.col("evaluation_method").alias("_cfg_method"),
            F.col("threshold").alias("_cfg_threshold"),
            F.col("weight").alias("_cfg_weight"),
        )
    )
    j = pairs.join(cfg, ["classification", "attribute_name"], "left")
    method = F.coalesce(F.col("_cfg_method"), F.lit(default_method))
    threshold = F.coalesce(F.col("_cfg_threshold"), F.lit(default_threshold))
    weight = F.coalesce(F.col("_cfg_weight"), F.lit(default_weight))
    expected_missing = F.col("expected").isNull() | (
        F.trim(F.col("expected").cast("string")) == ""
    )
    actual_present = F.col("actual").isNotNull() & (
        F.trim(F.col("actual").cast("string")) != ""
    )
    matched = compare_values(F.col("expected"), F.col("actual"), method, threshold)
    score = (
        F.when(method.isin("FUZZY", "SEMANTIC"), fuzzy_score(F.col("expected"), F.col("actual")))
        .otherwise(matched.cast("double"))
    )
    return (
        j.withColumn("evaluation_method", method)
        .withColumn("threshold", threshold)
        .withColumn("weight", weight)
        .withColumn("auto_configured", F.col("_cfg_method").isNull())
        .withColumn(
            "unexpected",
            F.col("_cfg_method").isNull() & expected_missing & actual_present,
        )
        .withColumn("matched", matched)
        .withColumn("score", F.round(score, 6))
        .drop("_cfg_method", "_cfg_threshold", "_cfg_weight")
    )


def rollup_metrics(attr_eval: DataFrame, keys: list[str]) -> DataFrame:
    """Roll attribute-level matched/score rows up to any grouping level
    (section = [conv_id, section_id]; document = [conv_id]) — the
    attribute→section→document cascade (``evaluation/service.py:1564-1902``).

    Counts an unmatched expected attribute as FN when actual is missing,
    FP+FN when present-but-wrong, TP when matched — the tp/fp/fn
    accounting of ``evaluation/service.py:1680-1745``."""
    actual_missing = F.col("actual").isNull() | (F.trim(F.col("actual").cast("string")) == "")
    flags = attr_eval.select(
        *keys,
        F.when(F.col("matched"), 1).otherwise(0).alias("tp"),
        F.when(~F.col("matched") & ~actual_missing, 1).otherwise(0).alias("fp"),
        F.when(~F.col("matched"), 1).otherwise(0).alias("fn"),
        F.lit(0).alias("tn"),
        F.col("score"),
        F.col("weight"),
    )
    return flags.groupBy(*keys).agg(
        *metric_aggs(),
        F.round(
            _safe_div(F.sum(F.col("score") * F.col("weight")), F.sum("weight")), 6
        ).alias("weighted_overall_score"),
        F.count(F.lit(1)).alias("n_attributes"),
    )


# ---------------------------------------------------------------------------
# doc-split / classification metrics (doc_split_classification_metrics.py)
# ---------------------------------------------------------------------------

def split_metrics(pred_sections: DataFrame, gold_sections: DataFrame) -> DataFrame:
    """Split accuracy with and without order
    (``evaluation/doc_split_classification_metrics.py:19-260``).

    Inputs are sections tables (conv_id, section_id, classification,
    turn_idxs).  'Without order' compares the multiset of turn-groups;
    'with order' additionally requires identical section numbering."""
    def keyed(df: DataFrame, prefix: str) -> DataFrame:
        return df.groupBy("conv_id").agg(
            F.sort_array(
                F.collect_list(F.struct("section_id", "classification", "turn_idxs"))
            ).alias(f"{prefix}_ordered"),
            F.sort_array(
                F.collect_list(F.struct("classification", "turn_idxs"))
            ).alias(f"{prefix}_unordered"),
        )

    joined = keyed(pred_sections, "p").join(keyed(gold_sections, "g"), "conv_id")
    per_conv = joined.select(
        "conv_id",
        (F.col("p_ordered") == F.col("g_ordered")).cast("int").alias("split_ok_ordered"),
        (F.col("p_unordered") == F.col("g_unordered")).cast("int").alias("split_ok_unordered"),
    )
    return per_conv.agg(
        F.round(F.avg("split_ok_ordered"), 6).alias("split_accuracy_with_order"),
        F.round(F.avg("split_ok_unordered"), 6).alias("split_accuracy_without_order"),
        F.count(F.lit(1)).alias("n_conversations"),
    )


def page_classification_accuracy(pred: DataFrame, gold: DataFrame) -> DataFrame:
    """Per-turn classification accuracy (``doc_split_classification_metrics.py:19-34``):
    join predicted vs gold per-turn labels, avg(pred == gold)."""
    p = pred.select("conv_id", "turn_idx", F.col("classification").alias("p_cls"))
    g = gold.select("conv_id", "turn_idx", F.col("classification").alias("g_cls"))
    return p.join(g, ["conv_id", "turn_idx"]).agg(
        F.round(F.avg((F.col("p_cls") == F.col("g_cls")).cast("double")), 6).alias(
            "page_classification_accuracy"
        ),
        F.count(F.lit(1)).alias("n_turns"),
    )


# ---------------------------------------------------------------------------
# end-to-end evaluation report (evaluation/service.py:1655-1902)
# ---------------------------------------------------------------------------

def evaluate_extraction(pred: DataFrame, gold: DataFrame) -> dict:
    """Full evaluation report: predicted vs golden per-turn extraction.

    Joins on (conv_id, turn_idx) and treats each derived field as an
    'attribute' scored with the matching comparator — classification
    EXACT, extracted_text FUZZY, confidence NUMERIC — then rolls up to
    turn/conversation/corpus levels, mirroring the reference's
    attribute→section→document cascade.  Returns
    {"attributes", "by_conversation", "overall"} DataFrames."""
    p = pred.select(
        "conv_id",
        "turn_idx",
        F.col("extracted_text").alias("p_text"),
        F.col("classification").alias("p_cls"),
        F.col("confidence").cast("string").alias("p_conf"),
    )
    g = gold.select(
        "conv_id",
        "turn_idx",
        F.col("extracted_text").alias("g_text"),
        F.col("classification").alias("g_cls"),
        F.col("confidence").cast("string").alias("g_conf"),
    )
    joined = p.join(g, ["conv_id", "turn_idx"], "full_outer")
    attrs = None
    for name, pe, ge, method, weight in (
        ("extracted_text", "p_text", "g_text", "FUZZY", 2.0),
        ("classification", "p_cls", "g_cls", "EXACT", 1.0),
        ("confidence", "p_conf", "g_conf", "NUMERIC_EXACT", 0.5),
    ):
        a = joined.select(
            "conv_id",
            "turn_idx",
            F.lit(name).alias("attribute_name"),
            F.col(ge).alias("expected"),
            F.col(pe).alias("actual"),
            F.lit(method).alias("evaluation_method"),
            F.lit(weight).alias("weight"),
        )
        attrs = a if attrs is None else attrs.unionByName(a)
    scored = attribute_eval(attrs)
    return {
        "attributes": scored,
        "by_conversation": rollup_metrics(scored, ["conv_id"]),
        "overall": rollup_metrics(scored.withColumn("_all", F.lit(1)), ["_all"]).drop("_all"),
    }
