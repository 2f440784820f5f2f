"""Layout tables/forms lift (round 4): Spark from_json lift vs the
Python kernel twin, duplicate-key semantics, markdown render edges.

Reference semantics: Page.tables / Page.forms
(``lib/idp_common_pkg/idp_common/models.py:44-50``) and the
table→markdown render (``ocr/document_converter.py:331``)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark.kernel import layout as klay
from accelerated_intelligent_document_processing_on_aws_spark.operators import (
    layout_tables as lt,
)


def _pay_df(spark, payloads):
    return spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "media_id long, payload string"
    )


class TestLiftCells:
    def test_synth_lift_matches_kernel_twin(self, spark):
        ids = spark.range(0, 40).select(F.col("id").alias("doc_id"))
        pay = lt.synth_layout_payloads(ids)
        got = {
            (r["media_id"], r["table_id"], r["row"], r["col"]): (
                r["text"],
                round(r["conf"], 6),
            )
            for r in lt.lift_table_cells(pay).collect()
        }
        want = {}
        for p in pay.collect():
            for c in klay.extract_tables(p["payload"]):
                want[(p["media_id"], c["table"], c["row"], c["col"])] = (
                    c["text"],
                    round(c["conf"], 6),
                )
        assert got == want
        assert len(got) > 40 * 4  # at least one 2x2 table per doc

    def test_non_cell_records_ignored(self, spark):
        payload = json.dumps(
            [
                {"kind": "line", "text": "hello", "conf": 0.9},
                {"kind": "kv", "key": "a", "text": "b", "conf": 0.5},
                {"kind": "cell", "table": 0, "row": 0, "col": 0, "text": "x", "conf": 1.0},
            ]
        )
        out = lt.lift_table_cells(_pay_df(spark, [payload])).collect()
        assert len(out) == 1 and out[0]["text"] == "x"

    def test_malformed_payload_yields_no_rows(self, spark):
        out = lt.lift_table_cells(
            _pay_df(spark, ["not json", "{}", "[1,2,3]", ""])
        ).collect()
        assert out == []
        assert klay.extract_tables("not json") == []


class TestLiftForms:
    def test_duplicate_key_last_wins(self, spark):
        payload = json.dumps(
            [
                {"kind": "kv", "key": "name", "text": "first", "conf": 0.9},
                {"kind": "kv", "key": "other", "text": "o", "conf": 0.8},
                {"kind": "kv", "key": "name", "text": "second", "conf": 0.1},
            ]
        )
        rows = {
            r["key"]: r["value"]
            for r in lt.lift_form_fields(_pay_df(spark, [payload])).collect()
        }
        assert rows == {"name": "second", "other": "o"}
        assert klay.extract_forms(payload) == rows

    def test_synth_forms_match_kernel_twin(self, spark):
        ids = spark.range(0, 30).select(F.col("id").alias("doc_id"))
        pay = lt.synth_layout_payloads(ids)
        got = {}
        for r in lt.lift_form_fields(pay).collect():
            got.setdefault(r["media_id"], {})[r["key"]] = r["value"]
        for p in pay.collect():
            assert got.get(p["media_id"], {}) == klay.extract_forms(p["payload"])


class TestMarkdown:
    def test_grid_shape(self, spark):
        payload = json.dumps(
            [
                {"kind": "cell", "table": 0, "row": 0, "col": 0, "text": "h1", "conf": 1.0},
                {"kind": "cell", "table": 0, "row": 0, "col": 1, "text": "h2", "conf": 1.0},
                {"kind": "cell", "table": 0, "row": 1, "col": 0, "text": "a", "conf": 1.0},
                {"kind": "cell", "table": 0, "row": 1, "col": 1, "text": "b", "conf": 1.0},
            ]
        )
        cells = lt.lift_table_cells(_pay_df(spark, [payload]))
        md = lt.tables_markdown(cells).collect()[0]["markdown"]
        assert md == "| h1 | h2 |\n|---|---|\n| a | b |"
        assert klay.tables_to_markdown(klay.extract_tables(payload)) == {0: md}

    def test_single_row_table_no_trailing_newline(self, spark):
        payload = json.dumps(
            [
                {"kind": "cell", "table": 3, "row": 0, "col": 0, "text": "only", "conf": 1.0},
            ]
        )
        cells = lt.lift_table_cells(_pay_df(spark, [payload]))
        md = lt.tables_markdown(cells).collect()[0]["markdown"]
        assert md == "| only |\n|---|"
        assert klay.tables_to_markdown(klay.extract_tables(payload)) == {3: md}

    def test_render_matches_twin_on_synth(self, spark):
        ids = spark.range(0, 25).select(F.col("id").alias("doc_id"))
        pay = lt.synth_layout_payloads(ids)
        got = {}
        for r in lt.tables_markdown(lt.lift_table_cells(pay)).collect():
            got.setdefault(r["media_id"], {})[r["table_id"]] = r["markdown"]
        for p in pay.collect():
            want = klay.tables_to_markdown(klay.extract_tables(p["payload"]))
            assert got.get(p["media_id"], {}) == want


def test_lift_plan_has_no_python(spark):
    """The lift must stay whole-stage-codegen: from_json/explode are
    JVM expressions — no ArrowEvalPython/BatchEvalPython nodes."""
    ids = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    plan = (
        lt.lift_table_cells(lt.synth_layout_payloads(ids))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
