"""Distributed per-turn extraction: the pipeline's hot path.

Replaces the reference's OCR→classification→assessment Lambda chain
(``patterns/pattern-2/statemachine/workflow.asl.json``) with ONE
Arrow-batched ``mapInPandas`` pass: each executor pulls columnar
batches, runs the pure kernel per turn, and emits the extracted
columns.  There is no per-row Python at the Spark API surface — batches
in, batches out — matching the input-hint requirement.

Scale design (100 TB / 10^12 turns):

- **Salted repartition.**  Turn-level extraction is embarrassingly
  parallel, but Zipf conversation lengths make any conv_id-keyed layout
  skewed.  We repartition by ``xxhash64(conv_id)`` *plus a turn-derived
  salt* so one 10^6-turn conversation spreads across ``salt`` tasks
  (north rule's skew defusal).  The later window/segmentation phase
  re-shuffles by conv_id alone — that phase touches only the narrow
  derived columns, never the raw text.
- **Column pruning.**  The kernel consumes exactly
  (conv_id, turn_idx, role, text, tool, ts); Catalyst prunes the scan
  to those columns (visible as ReadSchema in .explain).
- **Lineage.**  Each output row carries its kernel task's partition id
  and amortized per-row latency; :func:`lineage` aggregates them into
  the north-rule lineage table (partition_id, rows_in, rows_out,
  extract_ms) — the analog of the reference's metering capture
  (``reporting/save_reporting_data.py:1084-1097``).
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernel.oracle import extract_turn, extract_turn_raw

SPAN_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("start", T.IntegerType()),
            T.StructField("end", T.IntegerType()),
            T.StructField("kind", T.StringType()),
            T.StructField("conf", T.DoubleType()),
        ]
    )
)

EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("payload_kind", T.StringType()),
        T.StructField("extracted_text", T.StringType()),
        T.StructField("spans", SPAN_TYPE),
        T.StructField("classification", T.StringType()),
        T.StructField("boundary", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("_partition_id", T.IntegerType()),
        T.StructField("_row_ms", T.DoubleType()),
    ]
)


def _kernel_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else -1
    for pdf in batches:
        t0 = time.perf_counter()
        n = len(pdf)
        if n == 0:
            continue
        texts = pdf["text"].to_numpy()
        roles = pdf["role"].to_numpy()
        tools = pdf["tool"].to_numpy()
        ex_text: list[str] = []
        ex_spans: list[list[dict]] = []
        ex_cls: list[str] = []
        ex_bnd: list[str] = []
        ex_conf: list[float] = []
        ex_kind: list[str] = []
        for i in range(n):
            r = extract_turn(texts[i], roles[i], tools[i])
            ex_text.append(r["extracted_text"])
            ex_spans.append(r["spans"])
            ex_cls.append(r["classification"])
            ex_bnd.append(r["boundary"])
            ex_conf.append(r["confidence"])
            ex_kind.append(r["payload_kind"])
        row_ms = (time.perf_counter() - t0) * 1000.0 / n
        yield pd.DataFrame(
            {
                "conv_id": pdf["conv_id"],
                "turn_idx": pdf["turn_idx"],
                "role": pdf["role"],
                "tool": pdf["tool"],
                "ts": pdf["ts"],
                "payload_kind": ex_kind,
                "extracted_text": ex_text,
                "spans": ex_spans,
                "classification": ex_cls,
                "boundary": ex_bnd,
                "confidence": ex_conf,
                "_partition_id": pid,
                "_row_ms": row_ms,
            }
        )


def _kernel_batches_arrow(batches):
    """mapInArrow twin of :func:`_kernel_batches`: builds the output
    RecordBatch with pyarrow directly, skipping the pandas object-column
    round-trip (list-of-dict spans are the expensive part)."""
    import pyarrow as pa

    ctx = TaskContext.get()
    pid = ctx.partitionId() if ctx is not None else -1
    for batch in batches:
        n = batch.num_rows
        if n == 0:
            continue
        t0 = time.perf_counter()
        names = batch.schema.names
        col = {name: batch.column(i) for i, name in enumerate(names)}
        texts = col["text"].to_pylist()
        roles = col["role"].to_pylist()
        tools = col["tool"].to_pylist()
        ex_text: list[str] = []
        ex_cls: list[str] = []
        ex_bnd: list[str] = []
        ex_conf: list[float] = []
        ex_kind: list[str] = []
        # spans flattened: offsets into four flat component lists — the
        # ListArray is assembled columnar-native below, no per-span dict
        offsets: list[int] = [0]
        s_start: list[int] = []
        s_end: list[int] = []
        s_kind: list[str] = []
        s_conf: list[float] = []
        for i in range(n):
            extracted, spans, cls, bnd, conf, kind = extract_turn_raw(
                texts[i], roles[i], tools[i]
            )
            ex_text.append(extracted)
            ex_cls.append(cls)
            ex_bnd.append(bnd)
            ex_conf.append(conf)
            ex_kind.append(kind)
            for s, e, k, c in spans:
                s_start.append(s)
                s_end.append(e)
                s_kind.append(k)
                s_conf.append(c)
            offsets.append(len(s_start))
        span_arr = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.StructArray.from_arrays(
                [
                    pa.array(s_start, pa.int32()),
                    pa.array(s_end, pa.int32()),
                    pa.array(s_kind, pa.string()),
                    pa.array(s_conf, pa.float64()),
                ],
                names=["start", "end", "kind", "conf"],
            ),
        )
        row_ms = (time.perf_counter() - t0) * 1000.0 / n
        yield pa.RecordBatch.from_arrays(
            [
                col["conv_id"],
                col["turn_idx"],
                col["role"],
                col["tool"],
                col["ts"],
                pa.array(ex_kind, pa.string()),
                pa.array(ex_text, pa.string()),
                span_arr,
                pa.array(ex_cls, pa.string()),
                pa.array(ex_bnd, pa.string()),
                pa.array(ex_conf, pa.float64()),
                pa.array([pid] * n, pa.int32()),
                pa.array([row_ms] * n, pa.float64()),
            ],
            names=[f.name for f in EXTRACTED_SCHEMA.fields],
        )


def extract_turns(
    transcripts: DataFrame,
    num_partitions: int | None = None,
    salt: int = 16,
    use_arrow: bool = True,
) -> DataFrame:
    """Run the extraction kernel over a transcripts DataFrame.

    ``salt`` splits each conversation across up to ``salt`` kernel tasks
    (pure per-turn work, order restored downstream by window sort).

    ``salt=0`` skips the repartition entirely and runs the kernel
    straight on the SCAN partitions — zero shuffle, so the text bytes
    never leave their scan task.  Measured ~1.5× faster at sf0.1
    (the salted exchange moves the whole text column).  Use it when the
    input layout is already row-balanced (byte-split parquet/Iceberg
    scans are, regardless of conversation skew); keep the default
    salted repartition when the input is conv-clustered (one file per
    conversation, conv-sorted exports) — there the shuffle IS the skew
    defusal the north rule requires.
    """
    df = transcripts.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    if salt > 0:
        if num_partitions is None:
            # 3× cores measured fastest for the kernel stage in the round-2
            # sweep (enough slots to absorb Zipf stragglers; with 5k-row Arrow
            # batches the extra partitions don't over-fragment transfers)
            num_partitions = 3 * transcripts.sparkSession.sparkContext.defaultParallelism
        parts = [F.xxhash64("conv_id"), F.pmod(F.col("turn_idx"), F.lit(salt))]
        df = df.repartition(num_partitions, *parts)
    if use_arrow:
        return df.mapInArrow(_kernel_batches_arrow, schema=EXTRACTED_SCHEMA)
    return df.mapInPandas(_kernel_batches, schema=EXTRACTED_SCHEMA)


def extract_turns_skew_aware(
    transcripts: DataFrame,
    num_partitions: int | None = None,
    salt: int = 16,
    heavy_turns: int = 10_000,
) -> DataFrame:
    """Skew-aware hybrid of the two :func:`extract_turns` strategies:
    only conversations LONGER than ``heavy_turns`` take the salted
    repartition; everything else runs straight on the scan partitions.

    At 10^12 turns the full salted repartition moves every text byte
    through the shuffle to defuse a skew that only the Zipf tail
    actually has.  Here the tail is identified with one cheap
    conv_id-only aggregate (columnar scan of a single dictionary-coded
    column, no text), broadcast as a semi/anti-join filter, and ONLY
    those conversations' turns are shuffled — the salted exchange
    shrinks from 100% of the corpus to the heavy-tail fraction while
    the skew defusal the north rule requires still applies to exactly
    the conversations that need it.  Two filtered scans replace one
    scan + full shuffle: at scale, re-reading columnar storage is
    cheaper than writing + reading the whole corpus through shuffle.

    Output is row-identical to both pure strategies (kernel is
    per-turn; union order is immaterial under the downstream
    Window.partitionBy(conv_id).orderBy(turn_idx) restore) — asserted
    by tests/test_pipeline_spark.py's skew-aware equivalence test.
    """
    df = transcripts.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    # lazy localCheckpoint: the conv_id-count subtree is referenced by
    # BOTH branches — without it the plan evaluates the counting
    # aggregate twice (the multiply-referenced-subtree trap from the
    # minhash/simhash plans, NOTES round 3)
    heavy_ids = F.broadcast(
        df.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > heavy_turns)
        .select("conv_id")
        .localCheckpoint(eager=False)
    )
    light = df.join(heavy_ids, "conv_id", "left_anti")
    heavy = df.join(heavy_ids, "conv_id", "left_semi")
    if num_partitions is None:
        num_partitions = transcripts.sparkSession.sparkContext.defaultParallelism
    heavy = heavy.repartition(
        num_partitions,
        F.xxhash64("conv_id"),
        F.pmod(F.col("turn_idx"), F.lit(max(salt, 1))),
    )
    return light.mapInArrow(_kernel_batches_arrow, schema=EXTRACTED_SCHEMA).unionAll(
        heavy.mapInArrow(_kernel_batches_arrow, schema=EXTRACTED_SCHEMA)
    )


def lineage(extracted: DataFrame, by: tuple[str, ...] = ()) -> DataFrame:
    """North-rule lineage table: one row per kernel task partition
    (× any extra ``by`` columns, e.g. the checkpoint bucket, so lineage
    partitions line up with the extracted table's layout)."""
    return (
        extracted.groupBy(*by, F.col("_partition_id").alias("partition_id"))
        .agg(
            F.count(F.lit(1)).alias("rows_in"),
            F.count("extracted_text").alias("rows_out"),
            F.round(F.sum("_row_ms"), 3).alias("extract_ms"),
        )
        .withColumn("ts", F.current_timestamp())
    )


def drop_internal(extracted: DataFrame) -> DataFrame:
    return extracted.drop("_partition_id", "_row_ms")


def alerts(extracted: DataFrame, threshold: float = 0.8) -> DataFrame:
    """Confidence threshold alerts (assessment analog,
    ``assessment/service.py:262-286``): rows whose per-turn confidence
    falls below the threshold."""
    return (
        extracted.where(F.col("confidence") < F.lit(threshold))
        .select(
            "conv_id",
            "turn_idx",
            "classification",
            "confidence",
            F.lit(threshold).alias("confidence_threshold"),
        )
    )


def alerts_with_thresholds(
    extracted: DataFrame, thresholds: DataFrame, default_threshold: float = 0.8
) -> DataFrame:
    """Per-class confidence thresholds — the analog of the reference's
    per-attribute ``x-aws-idp-confidence-threshold`` injection
    (``assessment/service.py:181-290``): each classification carries its
    own alert threshold from a broadcast dim table
    (classification, threshold); unlisted classes use the default."""
    dim = F.broadcast(
        thresholds.select(
            "classification", F.col("threshold").alias("_class_threshold")
        )
    )
    thr = F.coalesce(F.col("_class_threshold"), F.lit(default_threshold))
    return (
        extracted.join(dim, "classification", "left")
        .where(F.col("confidence") < thr)
        .select(
            "conv_id",
            "turn_idx",
            "classification",
            "confidence",
            thr.alias("confidence_threshold"),
        )
    )


def payload_kind_udf():
    """Standalone file-type sniff as an Arrow-batched UDF — the magic-
    prefix + parse-validation dispatch of ``ocr/service.py:1677-1723``
    (extension + magic bytes → {pdf,txt,csv,...}), restated for the
    transcript payload kinds {html, layout, plain}.  The extraction
    kernel runs the same function inline (``kernel/oracle.py``,
    ``sniff_payload_kind``); this exposes it for payload routing
    outside the kernel."""
    from pyspark.sql.functions import pandas_udf

    from ..kernel.oracle import sniff_payload_kind

    @pandas_udf(T.StringType())
    def _sniff(text: pd.Series) -> pd.Series:
        return text.map(lambda t: sniff_payload_kind(t or ""))

    return _sniff
