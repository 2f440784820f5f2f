"""JSON extraction/repair + chunking + text-confidence tests."""

import pytest
from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark.functions import chunking
from accelerated_intelligent_document_processing_on_aws_spark.kernel.json_extract import (
    extract_json,
    repair_truncated,
)


class TestJsonKernel:
    def test_fenced_block(self):
        txt = 'Sure! Here it is:\n```json\n{"a": 1, "b": [2, 3]}\n```\nDone.'
        j, repaired = extract_json(txt)
        assert j == '{"a":1,"b":[2,3]}' and not repaired

    def test_brace_matching_with_noise(self):
        txt = 'prefix text {"a": {"nested": "x}y"}} suffix'
        j, repaired = extract_json(txt)
        assert j == '{"a":{"nested":"x}y"}}' and not repaired

    def test_whole_text(self):
        assert extract_json('[1, 2, 3]') == ("[1,2,3]", False)

    def test_truncated_object_repaired(self):
        j, repaired = extract_json('{"a": 1, "b": {"c": 2')
        assert repaired
        import json as pyjson

        parsed = pyjson.loads(j)
        assert parsed["a"] == 1

    def test_truncated_string_repaired(self):
        j, repaired = extract_json('{"a": "unterminated')
        assert repaired and j is not None

    def test_incomplete_trailing_member_dropped(self):
        j, repaired = extract_json('{"a": 1, "b":')
        assert repaired
        import json as pyjson

        assert pyjson.loads(j) == {"a": 1}

    def test_hopeless_input(self):
        assert extract_json("no json here at all") == (None, False)
        assert extract_json(None) == (None, False)

    def test_repair_truncated_direct(self):
        assert repair_truncated('{"k": 1') == '{"k": 1}'


class TestJsonSpark:
    def test_udf_roundtrip(self, spark):
        from accelerated_intelligent_document_processing_on_aws_spark.operators.jsonops import (
            extract_json_udf,
        )

        df = spark.createDataFrame(
            [(1, '{"k": 42}'), (2, 'text {"k": 7'), (3, "nothing")],
            "id int, raw string",
        )
        got = {
            r["id"]: (r["r"]["json"], r["r"]["repaired"])
            for r in df.withColumn("r", extract_json_udf("raw")).collect()
        }
        assert got[1] == ('{"k":42}', False)
        assert got[2][1] is True and '"k"' in got[2][0]
        assert got[3] == (None, False)

    def test_schema_discovery(self, spark):
        from accelerated_intelligent_document_processing_on_aws_spark.operators.jsonops import (
            discover_json_schema,
            parse_with_schema,
        )

        df = spark.createDataFrame(
            [('{"a": 1, "b": "x"}',), ('{"a": 2, "c": 3.5}',)], "js string"
        )
        schema = discover_json_schema(df, "js")
        assert {f.name for f in schema.fields} == {"a", "b", "c"}
        parsed = parse_with_schema(df, "js", schema)
        assert parsed.select("parsed.a").collect()[0][0] == 1


class TestChunking:
    def test_chunk_spans_overlap(self, spark):
        text = " ".join(f"w{i}" for i in range(25))
        df = spark.createDataFrame([(1, text)], "id int, text string")
        chunks = df.select(
            F.explode(chunking.chunk_spans("text", chunk_size=10, overlap=5)).alias("c")
        ).select("c.chunk_idx", "c.chunk_text").collect()
        # starts at 0,5,10,15,20 → 5 chunks
        assert [c["chunk_idx"] for c in chunks] == [0, 1, 2, 3, 4]
        assert chunks[0]["chunk_text"].split() == [f"w{i}" for i in range(10)]
        assert chunks[1]["chunk_text"].split() == [f"w{i}" for i in range(5, 15)]
        assert chunks[4]["chunk_text"].split() == [f"w{i}" for i in range(20, 25)]

    def test_chunk_table(self, spark):
        df = spark.createDataFrame([(1, "a b c d e f")], "id int, text string")
        out = chunking.chunk_table(df, ["id"], "text", chunk_size=3, overlap=1)
        rows = out.orderBy("chunk_idx").collect()
        assert [r["chunk_text"] for r in rows] == ["a b c", "c d e", "e f"]

    def test_text_confidence_projection(self, spark, transcripts_path):
        from accelerated_intelligent_document_processing_on_aws_spark.operators.extract import (
            extract_turns,
        )

        ext = extract_turns(spark.read.parquet(transcripts_path).limit(50), salt=2)
        tc = chunking.text_confidence_table(ext)
        sample = tc.limit(20).collect()
        assert sample
        for r in sample:
            assert r["text"] != "" and 0.0 <= r["conf"] <= 1.0


class TestRules:
    def test_rule_kinds(self, spark):
        from accelerated_intelligent_document_processing_on_aws_spark.operators.rules import (
            Rule,
            summary,
            validate,
            violations,
        )

        df = spark.createDataFrame(
            [
                (1, "ok", "3-HIGH", 100.0),
                (2, None, "9-BAD", -5.0),
                (3, "  ", "1-LOW", 2_000_000.0),
            ],
            "id int, status string, prio string, amount double",
        )
        rules = [
            Rule("status_req", "status", "required"),
            Rule("prio_fmt", "prio", "regex", pattern=r"^[1-5]-[A-Z]+$"),
            Rule("amt_range", "amount", "range", lo=0.0, hi=1_000_000.0),
            Rule("status_set", "status", "one_of", allowed=["ok", "bad"]),
            Rule("prio_len", "prio", "max_length", max_len=6),
        ]
        res = validate(df, rules, ["id"])
        assert res.count() == 15
        got = {(r["id"], r["rule_name"]): r["passed"] for r in res.collect()}
        assert got[(1, "status_req")] and not got[(2, "status_req")] and not got[(3, "status_req")]
        assert got[(1, "prio_fmt")] and not got[(2, "prio_fmt")]
        assert got[(1, "amt_range")] and not got[(2, "amt_range")] and not got[(3, "amt_range")]
        assert got[(1, "status_set")] and not got[(3, "status_set")]
        v = violations(df, rules, ["id"])
        assert v.count() == 15 - sum(got.values())
        s = {r["rule_name"]: r for r in summary(res).collect()}
        assert s["status_req"]["n_checked"] == 3 and s["status_req"]["n_passed"] == 1


class TestDiscoverAttributes:
    def test_occurrence_and_majority_type(self, spark):
        from accelerated_intelligent_document_processing_on_aws_spark.operators.jsonops import (
            discover_attributes,
        )

        df = spark.createDataFrame(
            [
                ("invoice", '{"amount": 5, "memo": "a"}'),
                ("invoice", '{"amount": 6}'),
                ("invoice", '{"amount": "seven", "flag": true}'),
                ("ticket", '{"severity": 1.5}'),
            ],
            "cls string, j string",
        )
        got = {
            (r["classification"], r["attribute_name"]): r
            for r in discover_attributes(df, "cls", "j").collect()
        }
        amount = got[("invoice", "amount")]
        assert amount["n_present"] == 3
        assert amount["occurrence_rate"] == 1.0
        assert amount["inferred_type"] == "integer"  # majority over 2 int / 1 str
        assert got[("invoice", "memo")]["occurrence_rate"] == pytest.approx(1 / 3)
        assert got[("invoice", "flag")]["inferred_type"] == "boolean"
        assert got[("ticket", "severity")]["inferred_type"] == "number"
