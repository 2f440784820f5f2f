"""Tabular payload converters.

Analog of the reference's document converter
(``lib/idp_common_pkg/idp_common/ocr/document_converter.py``): CSV →
typed table (``:113-162``), table → markdown rendering (``:134-160``),
and line pagination (``:38-111``) — as Catalyst expressions over
payload columns, no Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_csv_column(df: DataFrame, col: str, schema: str, out: str = "rec") -> DataFrame:
    """Typed parse of a CSV-line column via ``from_csv`` (JVM parser)."""
    return df.withColumn(out, F.from_csv(F.col(col), schema))


def csv_fields(col: Column | str, sep: str = ",") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(F.split(c, sep), lambda x: F.trim(x))


def markdown_row(col: Column | str, sep: str = ",") -> Column:
    """Render one CSV line as a markdown table row (pipe-escaped, like
    the reference's text-confidence markdown ``ocr/service.py:1583``)."""
    fields = F.transform(csv_fields(col, sep), lambda x: F.regexp_replace(x, r"\|", r"\\|"))
    return F.concat(F.lit("| "), F.array_join(fields, " | "), F.lit(" |"))


def paginate_lines(df: DataFrame, id_cols: list[str], text_col: str,
                   lines_per_page: int = 10) -> DataFrame:
    """Split a multi-line text column into pages of ``lines_per_page``
    lines (``document_converter.py:38-111``): one row per page with the
    page's text and 1-based page number."""
    lines = F.split(F.col(text_col), r"\n")
    n_pages = F.ceil(F.size(lines) / F.lit(lines_per_page)).cast("int")
    pages = F.transform(
        F.sequence(F.lit(0), F.greatest(n_pages - 1, F.lit(0))),
        lambda p: F.struct(
            (p + 1).cast("int").alias("page_no"),
            F.array_join(F.slice(lines, p * lines_per_page + 1, lines_per_page), "\n").alias(
                "page_text"
            ),
        ),
    )
    return df.select(*id_cols, F.explode(pages).alias("p")).select(
        *id_cols, "p.page_no", "p.page_text"
    )
