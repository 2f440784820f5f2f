"""Structured Streaming ingest: same kernel, incremental execution."""

import os

from accelerated_intelligent_document_processing_on_aws_spark import streaming
from accelerated_intelligent_document_processing_on_aws_spark.fixtures import (
    generate_transcripts,
)


def _write_shards(spark, base, n_shards=3, convs_per_shard=10):
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(base, exist_ok=True)
    schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us", tz="UTC")),
        ]
    )
    total = 0
    for s in range(n_shards):
        rows = generate_transcripts(convs_per_shard, seed=100 + s)
        for r in rows:
            r["conv_id"] = f"s{s}-{r['conv_id']}"
        cols = {k: [r[k] for r in rows] for k in schema.names}
        pq.write_table(pa.Table.from_pydict(cols, schema=schema), f"{base}/shard{s}.parquet")
        total += len(rows)
    return total


class TestStreamingIngest:
    def test_stream_extracts_all_rows_exactly_once(self, spark, tmp_path):
        shard_dir = str(tmp_path / "shards")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        total = _write_shards(spark, shard_dir)

        stream = streaming.stream_transcripts(spark, shard_dir, max_files_per_trigger=1)
        assert stream.isStreaming
        q = streaming.run_stream_to_parquet(stream, out, ckpt, once=True)
        q.awaitTermination(180)

        got = spark.read.parquet(out)
        assert got.count() == total
        assert got.select("conv_id", "turn_idx").distinct().count() == total

        # restart with no new data → no duplicates (exactly-once sink)
        q2 = streaming.run_stream_to_parquet(
            streaming.stream_transcripts(spark, shard_dir), out, ckpt, once=True
        )
        q2.awaitTermination(120)
        assert spark.read.parquet(out).count() == total

    def test_windowed_counts_plan(self, spark, tmp_path):
        shard_dir = str(tmp_path / "shards2")
        _write_shards(spark, shard_dir, n_shards=1)
        stream = streaming.stream_transcripts(spark, shard_dir)
        counts = streaming.windowed_turn_counts(streaming.extracted_stream(stream))
        assert counts.isStreaming
        assert set(counts.columns) == {
            "window_start", "window_end", "classification", "n_turns",
        }
