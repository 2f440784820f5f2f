"""Custom stateful streaming operator: incremental BIO segmentation.

The batch engine numbers sections with a window over the whole
conversation (``operators.segmentation``).  In a stream, a
conversation's turns arrive across micro-batches, so section numbering
must carry state: ``applyInPandasWithState`` keyed by ``conv_id`` holds
``(last_class, last_section_id, last_turn_idx)`` and continues the
numbering exactly where the previous micro-batch stopped.

Semantics match the batch BIO rule (new section on class change or
boundary=='start', reference ``classification/service.py:2138-2214``)
under the stream contract that a conversation's turns are delivered in
non-decreasing ``turn_idx`` order across micro-batches (turns within a
batch are sorted before numbering; regressions in turn order would
need a reorder buffer + watermark, which the batch path makes
unnecessary for this engine's backfill-style usage).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("classification", T.StringType()),
        T.StructField("section_id", T.IntegerType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_class", T.StringType()),
        T.StructField("last_section", T.IntegerType()),
        T.StructField("last_turn", T.IntegerType()),
    ]
)


def _segment_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    conv_id = key[0]
    if state.exists:
        last_class, last_section, last_turn = state.get
    else:
        last_class, last_section, last_turn = None, 0, -1
    out_rows: list[tuple] = []
    for pdf in pdfs:
        pdf = pdf.sort_values("turn_idx")
        for turn_idx, cls, boundary in zip(
            pdf["turn_idx"], pdf["classification"], pdf["boundary"]
        ):
            if turn_idx <= last_turn:
                continue  # duplicate delivery: drop (idempotent)
            if last_class is None or cls != last_class or boundary == "start":
                last_section += 1
            last_class = cls
            last_turn = int(turn_idx)
            out_rows.append((conv_id, int(turn_idx), cls, last_section))
    state.update((last_class, last_section, last_turn))
    yield pd.DataFrame(
        out_rows, columns=["conv_id", "turn_idx", "classification", "section_id"]
    )


def streaming_sections(extracted_stream: DataFrame) -> DataFrame:
    """Per-turn section ids over a streaming extracted DataFrame
    (needs conv_id, turn_idx, classification, boundary)."""
    return (
        extracted_stream.select("conv_id", "turn_idx", "classification", "boundary")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _segment_group,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
