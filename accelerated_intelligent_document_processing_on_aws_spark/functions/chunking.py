"""Token-overlap chunking & text-confidence projection — Catalyst only.

- :func:`chunk_spans`: split a text column into token-window chunks of
  ``chunk_size`` tokens with ``overlap`` tokens of overlap — the
  reference's rule-validation chunker
  (``lib/idp_common_pkg/idp_common/rule_validation/service.py:153-220``)
  without Python in the plan: ``sequence`` over chunk starts +
  ``slice``/``array_join`` per chunk.
- :func:`text_confidence_table`: per-turn (text, conf) rows projected
  from the extraction spans — the token-reduced text-confidence view of
  ``ocr/service.py:1561-1601``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_spans(text: Column | str, chunk_size: int = 50, overlap: int = 10) -> Column:
    """array<struct<chunk_idx:int, chunk_text:string>> of token windows."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.filter(F.split(F.trim(c), r"\s+"), lambda t: t != "")
    step = max(chunk_size - overlap, 1)
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(step))
    return F.transform(
        starts,
        lambda s, i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.array_join(F.slice(toks, s + 1, chunk_size), " ").alias("chunk_text"),
        ),
    )


def chunk_table(df: DataFrame, id_cols: list[str], text_col: str,
                chunk_size: int = 50, overlap: int = 10) -> DataFrame:
    """Exploded long-format chunk table (one row per chunk)."""
    return df.select(
        *id_cols,
        F.explode(chunk_spans(text_col, chunk_size, overlap)).alias("c"),
    ).select(*id_cols, "c.chunk_idx", "c.chunk_text")


def text_confidence_table(extracted: DataFrame) -> DataFrame:
    """Per-span (text, conf) rows: substring the span ranges back out of
    the extracted text — pure projection, ~80-90% smaller than raw
    payloads like the reference's text-confidence JSON."""
    spans = F.transform(
        F.col("spans"),
        lambda s: F.struct(
            F.substring(F.col("extracted_text"), s["start"] + 1, s["end"] - s["start"]).alias(
                "text"
            ),
            s["conf"].alias("conf"),
        ),
    )
    return extracted.select(
        "conv_id", "turn_idx", F.explode(spans).alias("s")
    ).select("conv_id", "turn_idx", "s.text", "s.conf")
