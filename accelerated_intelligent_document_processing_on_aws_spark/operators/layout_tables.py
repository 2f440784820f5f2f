"""Structured table-cell / key-value-form lift from layout payloads.

The reference's OCR layer populates ``Page.tables`` (list of cell
dicts) and ``Page.forms`` (key→value map) from Textract TABLES/FORMS
block analysis (``lib/idp_common_pkg/idp_common/models.py:44-50``,
feature selection ``ocr/service.py:497-527``) and renders tables to a
markdown grid (``ocr/document_converter.py:331`` and the textractor
``to_markdown`` path, ``ocr/service.py:1603-1675``).

Spark-first analog: a layout payload is a JSON array of heterogeneous
block records — ``{"kind":"line",...}``, ``{"kind":"cell","table":t,
"row":r,"col":c,...}``, ``{"kind":"kv","key":k,...}`` — in arbitrary
(scan) order.  The lift is pure Catalyst: one ``from_json`` with a
permissive union schema (missing fields null out), one ``explode``,
one ``kind`` filter.  No UDF, so the parse inlines into whole-stage
codegen and the payload column prunes at the parquet scan.

The markdown render is likewise pure Catalyst (collect cells per row,
``concat_ws`` the grid) so it survives 100 TB: one shuffle on
(media_id, table_id), no Python.

The Python twin for the non-SQL pipeline path lives in
``kernel/layout.py`` (``extract_tables`` / ``extract_forms``) and is
asserted equal to this lift in ``tests/test_layout_tables.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Permissive union schema over all block kinds: from_json nulls out the
# fields a record doesn't carry (cells have table/row/col, kv has key).
BLOCK_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("kind", T.StringType()),
            T.StructField("table", T.IntegerType()),
            T.StructField("row", T.IntegerType()),
            T.StructField("col", T.IntegerType()),
            T.StructField("key", T.StringType()),
            T.StructField("text", T.StringType()),
            T.StructField("conf", T.DoubleType()),
        ]
    )
)


def lift_table_cells(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Lift table cells out of a layout-block payload column.

    Returns ``(id_col, table_id, row, col, text, conf)`` — one row per
    cell, the relational form of the reference's ``Page.tables`` list.
    Pure Catalyst (from_json → explode → filter); downstream grouping
    shuffles once on the id.
    """
    b = F.explode(F.from_json(F.col(payload_col), BLOCK_SCHEMA)).alias("b")
    return (
        df.select(F.col(id_col), b)
        .where(F.col("b.kind") == "cell")
        .select(
            id_col,
            F.col("b.table").alias("table_id"),
            F.col("b.row").alias("row"),
            F.col("b.col").alias("col"),
            F.col("b.text").alias("text"),
            F.col("b.conf").alias("conf"),
        )
    )


def lift_form_fields(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Lift key-value form fields: ``(id_col, key, value, conf)``.

    Mirrors ``Page.forms: Dict[str,str]`` — duplicate keys within one
    payload keep the LAST record in payload order (dict-update
    semantics, as the reference builds the map by iteration).  The
    dedup is a max-position window per (id, key), one shuffle.
    """
    from pyspark.sql import Window

    rec = F.posexplode(F.from_json(F.col(payload_col), BLOCK_SCHEMA)).alias(
        "pos", "b"
    )
    kv = (
        df.select(F.col(id_col), rec)
        .where(F.col("b.kind") == "kv")
        .select(
            id_col,
            F.col("pos"),
            F.col("b.key").alias("key"),
            F.col("b.text").alias("value"),
            F.col("b.conf").alias("conf"),
        )
    )
    w = Window.partitionBy(id_col, "key").orderBy(F.col("pos").desc())
    return (
        kv.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "pos")
    )


def tables_markdown(
    cells: DataFrame, id_col: str = "media_id"
) -> DataFrame:
    """Render lifted cells back to a markdown grid per (id, table).

    Analog of the reference's table→markdown render
    (``ocr/document_converter.py:331``, textractor ``to_markdown``):
    header row, ``|---|`` separator, then body rows.  Pure Catalyst —
    collect cells per table (one shuffle), sort in-place, assemble with
    ``concat_ws``; missing cells are skipped, not padded (cells arrive
    row-major from :func:`lift_table_cells` output).
    """
    grid = cells.groupBy(id_col, "table_id").agg(
        F.array_sort(
            F.collect_list(F.struct("row", "col", "text"))
        ).alias("cs"),
        (F.max("col") + 1).alias("ncols"),
    )
    row_ids = F.array_distinct(F.transform("cs", lambda c: c["row"]))
    line = lambda r: F.concat(  # noqa: E731
        F.lit("| "),
        F.concat_ws(
            " | ",
            F.transform(
                F.filter("cs", lambda c: c["row"] == r),
                lambda c: c["text"],
            ),
        ),
        F.lit(" |"),
    )
    lines = F.transform(row_ids, line)
    sep = F.concat(
        F.lit("|"), F.concat_ws("", F.array_repeat(F.lit("---|"), F.col("ncols")))
    )
    md = F.concat(
        F.element_at(lines, 1),
        F.lit("\n"),
        sep,
        F.when(F.size(lines) > 1, F.lit("\n")).otherwise(F.lit("")),
        F.concat_ws("\n", F.slice(lines, 2, F.greatest(F.size(lines) - 1, F.lit(0)))),
    )
    return grid.select(id_col, "table_id", md.alias("markdown"))


def synth_layout_payloads(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic layout-block payloads from an id column.

    Per id: ``1 + id % 2`` tables of ``2 + (id+t) % 3`` rows ×
    ``2 + (id+t) % 2`` cols (cell text ``c{r}x{c}t{t}d{id}``, conf
    ``((id*31 + t*53 + r*7 + c*13) % 1000)/1000``), ``1 + id % 3``
    form fields (``field{k}`` → ``v{(id*17 + k*5) % 100}``), and two
    noise line records.  Record order is scrambled deterministically so
    the lift cannot rely on generation order.  All Catalyst (sequence/
    transform/to_json) — the DuckDB oracle recomputes the same cells
    analytically from the formulas (the synth-media parity pattern of
    ``plans/parity_queries.py``).
    """
    i = F.col(id_col).cast("long")

    def cell(t, r, c):
        return F.struct(
            F.lit("cell").alias("kind"),
            t.cast("int").alias("table"),
            r.cast("int").alias("row"),
            c.cast("int").alias("col"),
            F.lit(None).cast("string").alias("key"),
            F.concat(
                F.lit("c"), r.cast("string"), F.lit("x"), c.cast("string"),
                F.lit("t"), t.cast("string"), F.lit("d"), i.cast("string"),
            ).alias("text"),
            (((i * 31 + t * 53 + r * 7 + c * 13) % 1000) / 1000.0).alias("conf"),
        )

    cells = F.flatten(
        F.transform(
            F.sequence(F.lit(0), (i % 2).cast("int")),
            lambda t: F.flatten(
                F.transform(
                    F.sequence(F.lit(0), ((i + t) % 3 + 1).cast("int")),
                    lambda r: F.transform(
                        F.sequence(F.lit(0), ((i + t) % 2 + 1).cast("int")),
                        lambda c: cell(t, r, c),
                    ),
                )
            ),
        )
    )

    def kv(k):
        return F.struct(
            F.lit("kv").alias("kind"),
            F.lit(None).cast("int").alias("table"),
            F.lit(None).cast("int").alias("row"),
            F.lit(None).cast("int").alias("col"),
            F.concat(F.lit("field"), k.cast("string")).alias("key"),
            F.concat(F.lit("v"), ((i * 17 + k * 5) % 100).cast("string")).alias(
                "text"
            ),
            (((i * 11 + k * 29) % 1000) / 1000.0).alias("conf"),
        )

    kvs = F.transform(F.sequence(F.lit(0), (i % 3).cast("int")), kv)

    def noise(n):
        return F.struct(
            F.lit("line").alias("kind"),
            F.lit(None).cast("int").alias("table"),
            F.lit(None).cast("int").alias("row"),
            F.lit(None).cast("int").alias("col"),
            F.lit(None).cast("string").alias("key"),
            F.concat(F.lit("noise"), n.cast("string")).alias("text"),
            F.lit(0.5).alias("conf"),
        )

    recs = F.concat(cells, kvs, F.array(noise(F.lit(0)), noise(F.lit(1))))
    # Deterministic scramble: sort by a per-record pseudo-key, position
    # as tiebreak (keeps kv last-wins order well-defined after unsort).
    scrambled = F.transform(
        F.array_sort(
            F.transform(
                recs,
                lambda x, p: F.struct(
                    ((i * 7 + p * 37) % 11).alias("s"), p.alias("p"), x.alias("x")
                ),
            )
        ),
        lambda s: s["x"],
    )
    # spread_scan (round 8): the nested-HOF payload assembly (and the
    # from_json lift that consumes it) inherit scan parallelism;
    # single-row-group fixture files scan as 1-2 partitions (no-op for
    # genuinely multi-partition input)
    from ..sources.tables import spread_scan

    return spread_scan(ids).select(
        i.alias("media_id"), F.to_json(scrambled).alias("payload")
    )
