"""Custom Python Data Source: JSONL transcript ingest."""

import json
import os

import pytest


def _write_shards(tmp_path, n_shards=3, rows_per=40):
    d = tmp_path / "shards"
    d.mkdir()
    total = 0
    for s in range(n_shards):
        with open(d / f"part-{s}.jsonl", "w") as f:
            for i in range(rows_per):
                f.write(json.dumps({
                    "conv_id": f"c{s}",
                    "turn_idx": i,
                    "role": "user" if i % 2 == 0 else "assistant",
                    "text": f"turn {i} of shard {s}",
                    "tool": None if i % 3 else "search",
                    "ts": f"2026-01-01T00:{i:02d}:00+00:00",
                }) + "\n")
                total += 1
    return str(d), total


class TestTranscriptJsonlSource:
    def test_reads_all_shards_in_parallel_partitions(self, spark, tmp_path):
        from accelerated_intelligent_document_processing_on_aws_spark.sources import (
            jsonl_source,
        )

        path, total = _write_shards(tmp_path)
        jsonl_source.register(spark)
        df = spark.read.format("transcript_jsonl").load(path)
        assert df.schema == jsonl_source.TRANSCRIPT_SCHEMA
        assert df.count() == total
        # one task per shard: the RDD has exactly n_shards partitions
        assert df.rdd.getNumPartitions() == 3
        got = df.where("conv_id = 'c1' and turn_idx = 5").collect()
        assert len(got) == 1
        assert got[0]["role"] == "assistant"
        assert got[0]["ts"].minute == 5

    def test_feeds_the_extraction_kernel(self, spark, tmp_path):
        from accelerated_intelligent_document_processing_on_aws_spark.operators.extract import (
            extract_turns,
        )
        from accelerated_intelligent_document_processing_on_aws_spark.sources import (
            jsonl_source,
        )

        path, total = _write_shards(tmp_path, n_shards=2, rows_per=10)
        jsonl_source.register(spark)
        df = spark.read.format("transcript_jsonl").load(path)
        out = extract_turns(df, salt=2)
        assert out.count() == total

    def test_strict_mode_raises_on_bad_row(self, spark, tmp_path):
        from py4j.protocol import Py4JJavaError

        from accelerated_intelligent_document_processing_on_aws_spark.sources import (
            jsonl_source,
        )

        d = tmp_path / "bad"
        d.mkdir()
        with open(d / "x.jsonl", "w") as f:
            f.write('{"conv_id": "a", "turn_idx": 0}\n')
            f.write("this is not json\n")
        jsonl_source.register(spark)
        df = spark.read.format("transcript_jsonl").load(str(d))
        with pytest.raises(Exception, match="bad transcript row"):
            df.collect()

    def test_permissive_mode_marks_bad_rows(self, spark, tmp_path):
        from accelerated_intelligent_document_processing_on_aws_spark.sources import (
            jsonl_source,
        )

        d = tmp_path / "mixed"
        d.mkdir()
        with open(d / "x.jsonl", "w") as f:
            f.write('{"conv_id": "a", "turn_idx": 0, "ts": 1700000000}\n')
            f.write("broken line\n")
        jsonl_source.register(spark)
        df = (
            spark.read.format("transcript_jsonl")
            .option("mode", "permissive")
            .load(str(d))
        )
        rows = df.collect()
        assert len(rows) == 2
        bad = [r for r in rows if r["conv_id"] is None]
        assert len(bad) == 1 and bad[0]["text"] == "broken line"
