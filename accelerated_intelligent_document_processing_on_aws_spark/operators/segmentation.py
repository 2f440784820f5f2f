"""Segmentation & grouping: pure DataFrame window logic, zero UDFs.

Reimplements the reference's three section strategies
(``lib/idp_common_pkg/idp_common/classification/service.py``):

- ``llm_determined`` (default, ``config/models.py:168-171``): BIO
  contiguous-run segmentation — new section when the class changes OR
  ``boundary == 'start'`` (``:2138-2214``, ``:2268-2329``).  Classic
  gaps-and-islands: boundary flag via ``lag`` over the conv-ordered
  window, then a running ``sum`` of flags numbers sections 1..k.
- ``disabled``: majority vote of VALID classes across the conversation,
  tie broken by earliest turn, invalid/blank excluded (``:2002-2094``,
  GitHub #167 semantics); one section spanning all turns.
- ``page``: one section per turn (``:2096-2136``).

Plus the supporting window operators: ±k context windows
(``:364-480``), limited-N classification with mode propagation
(``:236-362``), holistic segment-range expansion (``:2647-2687``), and
0-based min-normalized turn indices (``extraction/service.py:571-603``).

Scale note: every operator here shuffles ONCE on conv_id (or not at
all) and touches only narrow derived columns — the wide ``text`` /
``extracted_text`` columns never enter these shuffles.  AQE coalesces
the post-shuffle partitions; conversations are bounded (≤ ~10^3 turns)
so a conv-partitioned window is safe at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..kernel.classify import VALID_CLASSES

def _conv_order():
    return Window.partitionBy("conv_id").orderBy("turn_idx")


def _conv_running():
    return _conv_order().rowsBetween(Window.unboundedPreceding, Window.currentRow)


def tag_sections_bio(classified: DataFrame) -> DataFrame:
    """Add ``section_id`` (1..k per conv) via BIO gaps-and-islands.

    Input needs (conv_id, turn_idx, classification, boundary).
    """
    is_new = (
        F.lag("classification").over(_conv_order()).isNull()
        | (F.col("classification") != F.lag("classification").over(_conv_order()))
        | (F.col("boundary") == F.lit("start"))
    )
    return classified.withColumn(
        "section_id",
        F.sum(F.when(is_new, 1).otherwise(0)).over(_conv_running()).cast("int"),
    )


def sections(classified: DataFrame, strategy: str = "llm_determined") -> DataFrame:
    """Build the sections table
    ``(conv_id, section_id, classification, turn_idxs, n_turns, confidence)``.
    """
    if strategy == "llm_determined":
        tagged = tag_sections_bio(classified)
    elif strategy == "page":
        tagged = classified.withColumn(
            "section_id", F.row_number().over(_conv_order()).cast("int")
        )
    elif strategy == "disabled":
        voted = majority_class(classified)
        tagged = (
            classified.drop("classification")
            .join(voted, "conv_id")
            .withColumn("section_id", F.lit(1))
        )
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    return (
        tagged.groupBy("conv_id", "section_id")
        .agg(
            F.first("classification").alias("classification"),
            F.sort_array(F.collect_list("turn_idx")).alias("turn_idxs"),
            F.count(F.lit(1)).alias("n_turns"),
            F.round(F.avg("confidence"), 4).alias("confidence"),
        )
    )


def single_class_sections(turns: DataFrame, cls: str) -> DataFrame:
    """Single-class fast path (``classification/service.py:1847-1884``):
    when the class config defines exactly ONE class, every turn is that
    class at confidence 1.0 and each conversation is one section
    spanning all turns — no classifier runs at all.  A pure projection +
    one groupBy: the cheapest possible plan, which is the point of the
    reference's fast path (it skips the backend entirely)."""
    return (
        turns.groupBy("conv_id")
        .agg(
            F.sort_array(F.collect_list("turn_idx")).alias("turn_idxs"),
            F.count(F.lit(1)).alias("n_turns"),
        )
        .select(
            "conv_id",
            F.lit(1).alias("section_id"),
            F.lit(cls).alias("classification"),
            "turn_idxs",
            "n_turns",
            F.lit(1.0).alias("confidence"),
        )
    )


def name_regex_sections(turns: DataFrame, patterns: list[tuple[str, str]]):
    """Document-name regex fast path
    (``classification/service.py:215-232,1805-1844``): a conversation
    whose NAME matches a class's configured name regex is classified
    wholesale — every turn that class at confidence 1.0, ONE section —
    and never reaches the classifier.  First matching pattern wins, in
    config order (the reference iterates document_types in order).

    Returns ``(matched_sections, unmatched_turns)`` — the split keeps
    the expensive classifier plan from ever scanning matched
    conversations, like :func:`~..operators.jsonops.empty_schema_gate`.
    """
    cls = F.lit(None).cast("string")
    for c, pat in reversed(patterns):
        cls = F.when(F.col("conv_id").rlike(pat), F.lit(c)).otherwise(cls)
    tagged = turns.withColumn("_name_class", cls)
    matched = (
        tagged.where(F.col("_name_class").isNotNull())
        .groupBy("conv_id")
        .agg(
            F.first("_name_class").alias("classification"),
            F.sort_array(F.collect_list("turn_idx")).alias("turn_idxs"),
            F.count(F.lit(1)).alias("n_turns"),
        )
        .select(
            "conv_id",
            F.lit(1).alias("section_id"),
            "classification",
            "turn_idxs",
            "n_turns",
            F.lit(1.0).alias("confidence"),
        )
    )
    unmatched = tagged.where(F.col("_name_class").isNull()).drop("_name_class")
    return matched, unmatched


def majority_class(classified: DataFrame) -> DataFrame:
    """Per-conversation majority vote with earliest-turn tie-break.

    Invalid/blank classes are excluded from the vote
    (``classification/service.py:2044-2075``); a conversation with no
    valid votes is ``unclassified``.
    Returns (conv_id, classification).
    """
    votes = (
        classified.where(F.col("classification").isin(list(VALID_CLASSES)))
        .groupBy("conv_id", "classification")
        .agg(F.count(F.lit(1)).alias("n"), F.min("turn_idx").alias("first_turn"))
    )
    w = Window.partitionBy("conv_id").orderBy(
        F.desc("n"), F.asc("first_turn"), F.asc("classification")
    )
    winners = (
        votes.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("conv_id", "classification")
    )
    all_convs = classified.select("conv_id").distinct()
    return all_convs.join(winners, "conv_id", "left").select(
        "conv_id", F.coalesce("classification", F.lit("unclassified")).alias("classification")
    )


def context_windows(df: DataFrame, k: int = 1, col: str = "extracted_text") -> DataFrame:
    """±k neighbor context (``contextPagesCount``,
    ``classification/service.py:364-480``): arrays of the k preceding /
    following turns' text over the conv-ordered window."""
    prev = F.array_compact(F.array(*[F.lag(col, i).over(_conv_order()) for i in range(k, 0, -1)]))
    nxt = F.array_compact(F.array(*[F.lead(col, i).over(_conv_order()) for i in range(1, k + 1)]))
    return df.withColumn("context_before", prev).withColumn("context_after", nxt)


def limit_and_propagate(classified: DataFrame, max_turns: int) -> DataFrame:
    """Limited-page classification (``classification/service.py:236-362``):
    keep only the first ``max_turns`` per conversation's votes, propagate
    the most frequent class to every turn.  Returns (conv_id, turn_idx,
    classification)."""
    head = classified.withColumn("rn", F.row_number().over(_conv_order())).where(
        F.col("rn") <= max_turns
    )
    voted = majority_class(head)
    return (
        classified.select("conv_id", "turn_idx")
        .join(voted, "conv_id")
        .select("conv_id", "turn_idx", "classification")
    )


def expand_segment_ranges(segments: DataFrame, turns: DataFrame) -> DataFrame:
    """Holistic segments → per-turn rows
    (``classification/service.py:2647-2687``): a segments table
    (conv_id, section_id, start_idx, end_idx, classification) expands via
    ``sequence`` + ``explode`` and joins back to turns; out-of-range turn
    indices drop out via the inner join (reference drops them too)."""
    exploded = segments.select(
        "conv_id",
        "section_id",
        "classification",
        F.explode(F.sequence("start_idx", "end_idx")).alias("turn_idx"),
    )
    return turns.join(exploded, ["conv_id", "turn_idx"])


def normalized_indices(df: DataFrame) -> DataFrame:
    """0-based min-normalized indices per conversation
    (``extraction/service.py:571-603``)."""
    w = Window.partitionBy("conv_id")
    return df.withColumn(
        "turn_index0", (F.col("turn_idx") - F.min("turn_idx").over(w)).cast("int")
    )


def section_text(extracted_tagged: DataFrame) -> DataFrame:
    """Per-section document text: turn texts joined in stable turn order
    by newlines — the DOCUMENT_TEXT the reference feeds extraction
    (``extraction/service.py:624-656``)."""
    return (
        extracted_tagged.groupBy("conv_id", "section_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("turn_idx", "extracted_text"))
                    ),
                    lambda s: s["extracted_text"],
                ),
                "\n",
            ).alias("section_text")
        )
    )
