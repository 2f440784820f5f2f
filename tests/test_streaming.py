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


class TestStatefulSegmentation:
    def test_sections_continue_across_microbatches(self, spark, tmp_path):
        """Turns of one conversation split across two shards (delivered as
        two micro-batches) must get ONE continuous section numbering equal
        to the batch BIO result."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from datetime import datetime, timezone

        from accelerated_intelligent_document_processing_on_aws_spark.streaming.stateful import (
            streaming_sections,
        )

        ts = datetime(2026, 1, 1, tzinfo=timezone.utc)
        # classes: a a b b | b a a a  → sections 1 1 2 2 | 2 3 3 3
        turns = [
            (0, "a", "continue"), (1, "a", "continue"),
            (2, "b", "continue"), (3, "b", "continue"),
            (4, "b", "continue"), (5, "a", "continue"),
            (6, "a", "continue"), (7, "a", "start"),
        ]
        want = {0: 1, 1: 1, 2: 2, 3: 2, 4: 2, 5: 3, 6: 3, 7: 4}

        shard_dir = tmp_path / "shards"
        shard_dir.mkdir()
        schema = pa.schema(
            [("conv_id", pa.string()), ("turn_idx", pa.int32()),
             ("classification", pa.string()), ("boundary", pa.string())]
        )
        for si, chunk in enumerate((turns[:4], turns[4:])):
            pq.write_table(
                pa.Table.from_pydict(
                    {
                        "conv_id": ["c1"] * len(chunk),
                        "turn_idx": [t[0] for t in chunk],
                        "classification": [t[1] for t in chunk],
                        "boundary": [t[2] for t in chunk],
                    },
                    schema=schema,
                ),
                str(shard_dir / f"shard{si}.parquet"),
            )

        stream = (
            spark.readStream.schema(
                "conv_id string, turn_idx int, classification string, boundary string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(shard_dir))
        )
        out_dir = str(tmp_path / "out")
        q = (
            streaming_sections(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            r["turn_idx"]: r["section_id"]
            for r in spark.read.parquet(out_dir).collect()
        }
        assert got == want
