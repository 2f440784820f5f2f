"""Comparator + metric golden cases (FIXTURES.md §4, SURVEY.md §5(d))."""

import pytest
from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark.kernel.hungarian import assign
from accelerated_intelligent_document_processing_on_aws_spark.kernel.strings import (
    fuzzy_score as py_fuzzy,
    hungarian_compare,
    levenshtein,
)
from accelerated_intelligent_document_processing_on_aws_spark.operators import (
    evaluation as ev,
)


class TestHungarianKernel:
    def test_assign_simple(self):
        # classic: optimal is diagonal-avoiding
        cost = [[4, 1, 3], [2, 0, 5], [3, 2, 2]]
        pairs = assign(cost)
        total = sum(cost[r][c] for r, c in pairs)
        assert total == 5  # (0,1)+(1,0)+(2,2) = 1+2+2
        assert len(pairs) == 3

    def test_assign_rectangular(self):
        cost = [[1, 2, 3], [3, 1, 2]]
        pairs = assign(cost)
        assert len(pairs) == 2
        assert sum(cost[r][c] for r, c in pairs) == 2

    def test_levenshtein(self):
        assert levenshtein("kitten", "sitting") == 3
        assert levenshtein("", "ab") == 2

    def test_hungarian_compare_cases(self):
        # both empty → (0, 0, 1.0) — comparator.py:262-268
        assert hungarian_compare([], [], "EXACT") == (0, 0, 1.0)
        # expected empty, actual non-empty → all FP — comparator.py:269-273
        assert hungarian_compare([], ["x", "y"], "EXACT") == (0, 2, 0.0)
        # actual empty → no TP/FP — comparator.py:274-277
        assert hungarian_compare(["x"], [], "EXACT") == (0, 0, 0.0)
        # exact matches in scrambled order
        tp, fp, avg = hungarian_compare(["a", "b"], ["b", "a"], "EXACT")
        assert (tp, fp, avg) == (2, 0, 1.0)
        # one wrong → 1 TP 1 FP
        tp, fp, _ = hungarian_compare(["a", "b"], ["a", "zzz"], "EXACT")
        assert (tp, fp) == (1, 1)
        # numeric comparator: "$1,234.00" matches 1234
        tp, fp, _ = hungarian_compare(["$1,234.00"], ["1234"], "NUMERIC")
        assert (tp, fp) == (1, 0)

    def test_py_fuzzy(self):
        assert py_fuzzy("Hello, World!", "hello world") == 1.0
        assert py_fuzzy(None, None) == 1.0
        assert py_fuzzy("abc", "") == 0.0


@pytest.fixture(scope="module")
def pairs_df(spark):
    rows = [
        # (expected, actual, method)
        ("Hello, World!", "hello world", "EXACT", True),
        (None, None, "EXACT", True),
        ("", "  ", "EXACT", True),
        ("a", None, "EXACT", False),
        ("$1,234.00", "1234", "NUMERIC_EXACT", True),
        ("(500)", "500", "NUMERIC_EXACT", True),
        ("12.5", "12.50", "NUMERIC_EXACT", True),
        ("abc", "abd", "NUMERIC_EXACT", False),
        ("kitten", "sitting", "FUZZY", False),  # sim ≈ 0.571 < 0.8
        ("color", "colour", "FUZZY", True),  # sim ≈ 0.833
        ("exact same", "exact same", "FUZZY", True),
    ]
    return spark.createDataFrame(
        rows, "expected string, actual string, evaluation_method string, want boolean"
    )


class TestSparkComparators:
    def test_compare_values_dispatch(self, pairs_df):
        got = pairs_df.withColumn(
            "got",
            ev.compare_values(
                F.col("expected"), F.col("actual"), F.col("evaluation_method")
            ),
        ).collect()
        for r in got:
            assert r["got"] == r["want"], (r["expected"], r["actual"], r["evaluation_method"])

    def test_fuzzy_score_matches_python(self, spark):
        cases = [("kitten", "sitting"), ("color", "colour"), ("a b c", "abc")]
        df = spark.createDataFrame(cases, "a string, b string")
        got = df.withColumn("s", ev.fuzzy_score(F.col("a"), F.col("b"))).collect()
        for r, (a, b) in zip(got, cases):
            assert r["s"] == pytest.approx(py_fuzzy(a, b), abs=1e-9)

    def test_hungarian_udf(self, spark):
        df = spark.createDataFrame(
            [(["a", "b"], ["b", "a"]), (["a"], ["zzz"]), ([], ["x"])],
            "expected array<string>, actual array<string>",
        )
        got = df.withColumn("r", ev.hungarian_udf("EXACT")(F.col("expected"), F.col("actual"))).collect()
        assert (got[0]["r"]["tp"], got[0]["r"]["fp"]) == (2, 0)
        assert (got[1]["r"]["tp"], got[1]["r"]["fp"]) == (0, 1)
        assert (got[2]["r"]["tp"], got[2]["r"]["fp"]) == (0, 1)

    def test_embedding_compare(self, spark):
        df = spark.createDataFrame(
            [([1.0, 0.0], [2.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])],
            "a array<double>, b array<double>",
        )
        got = df.withColumn("m", ev.compare_embedding(F.col("a"), F.col("b"), 0.9)).collect()
        assert got[0]["m"] is True and got[1]["m"] is False


class TestMetrics:
    def test_rollup(self, spark):
        rows = [
            ("c1", 1, "name", "a", "a", "EXACT", 1.0),
            ("c1", 1, "amount", "$5", "5", "NUMERIC_EXACT", 2.0),
            ("c1", 2, "name", "x", "y", "EXACT", 1.0),
            ("c1", 2, "addr", "z", None, "EXACT", 1.0),
        ]
        df = spark.createDataFrame(
            rows,
            "conv_id string, section_id int, attribute_name string, "
            "expected string, actual string, evaluation_method string, weight double",
        )
        ev_rows = ev.attribute_eval(df)
        doc = ev.rollup_metrics(ev_rows, ["conv_id"]).collect()[0]
        # tp=2 (name, amount), fp=1 (x vs y present-but-wrong), fn=2
        assert doc["precision"] == pytest.approx(2 / 3)
        assert doc["recall"] == pytest.approx(2 / 4)
        assert doc["f1"] == pytest.approx(2 * (2 / 3) * 0.5 / ((2 / 3) + 0.5))
        assert doc["n_attributes"] == 4
        sec = {
            r["section_id"]: r
            for r in ev.rollup_metrics(ev_rows, ["conv_id", "section_id"]).collect()
        }
        assert sec[1]["precision"] == 1.0 and sec[2]["precision"] == 0.0

    def test_split_metrics(self, spark):
        pred = spark.createDataFrame(
            [
                ("c1", 1, "invoice", [0, 1]),
                ("c1", 2, "tech_note", [2]),
                ("c2", 1, "invoice", [0]),
            ],
            "conv_id string, section_id int, classification string, turn_idxs array<int>",
        )
        gold_same = pred
        m = ev.split_metrics(pred, gold_same).collect()[0]
        assert m["split_accuracy_with_order"] == 1.0
        assert m["split_accuracy_without_order"] == 1.0
        gold_diff = spark.createDataFrame(
            [
                ("c1", 1, "invoice", [0]),
                ("c1", 2, "tech_note", [1, 2]),
                ("c2", 1, "invoice", [0]),
            ],
            "conv_id string, section_id int, classification string, turn_idxs array<int>",
        )
        m2 = ev.split_metrics(pred, gold_diff).collect()[0]
        assert m2["split_accuracy_with_order"] == 0.5

    def test_page_accuracy(self, spark):
        pred = spark.createDataFrame(
            [("c1", 0, "a"), ("c1", 1, "b")], "conv_id string, turn_idx int, classification string"
        )
        gold = spark.createDataFrame(
            [("c1", 0, "a"), ("c1", 1, "a")], "conv_id string, turn_idx int, classification string"
        )
        m = ev.page_classification_accuracy(pred, gold).collect()[0]
        assert m["page_classification_accuracy"] == 0.5


class TestJudgeCascade:
    def test_judge_contract_and_reasons(self, spark):
        from accelerated_intelligent_document_processing_on_aws_spark.operators.evaluation import (
            compare_judge,
        )

        df = spark.createDataFrame(
            [
                (1, "Hello, World", "hello world"),     # exact after norm
                (2, "$1,234.50", "1234.5"),             # numeric equality only
                                                        # (norm_text differs: 123450 vs 12345)
                (3, "hello world", "helo world"),       # fuzzy >= 0.8
                (4, "hello world", "zzz"),              # rejected
            ],
            "id int, a string, b string",
        )
        got = {
            r["id"]: r["j"]
            for r in df.select("id", compare_judge(F.col("a"), F.col("b"), 0.8).alias("j")).collect()
        }
        assert got[1]["match"] and got[1]["reason"] == "exact match after normalization"
        assert got[1]["score"] == 1.0
        assert got[2]["match"] and "numeric equality" in got[2]["reason"]
        assert got[3]["match"] and "fuzzy similarity" in got[3]["reason"]
        assert 0.8 <= got[3]["score"] < 1.0
        assert not got[4]["match"] and got[4]["reason"] == "below similarity threshold"


class TestSemanticEmbedding:
    """Round-3: compare_semantic upgraded from fuzzy surrogate to
    hashed char-ngram embedding + cosine (comparator.py:422-492)."""

    def test_scores_and_edges(self, spark):
        from accelerated_intelligent_document_processing_on_aws_spark.operators import (
            evaluation as ev,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [
                (1, "Total Amount Due", "total amount due!"),  # normalize-equal
                (2, "hello world", "hello wxrld"),             # near
                (3, "zebra stripes", "quarterly revenue"),     # far
                (4, "", ""),                                   # both empty
                (5, "something", ""),                          # one empty
            ],
            "id int, a string, b string",
        )
        rows = {
            r["id"]: r
            for r in df.select(
                "id",
                F.round(ev.semantic_score(F.col("a"), F.col("b")), 6).alias("s"),
                ev.compare_semantic(F.col("a"), F.col("b"), 0.8).alias("m"),
            ).collect()
        }
        assert rows[1]["s"] == 1.0 and rows[1]["m"]
        assert 0.5 < rows[2]["s"] < 1.0
        # dim=16 bucket collisions put unrelated short strings around
        # 0.5-0.6 — what matters is the ordering and the 0.8 verdict
        assert rows[3]["s"] < rows[2]["s"] and not rows[3]["m"]
        assert rows[4]["s"] == 1.0 and rows[4]["m"]
        assert rows[5]["s"] == 0.0 and not rows[5]["m"]

    def test_embedding_deterministic_and_counts(self, spark):
        from accelerated_intelligent_document_processing_on_aws_spark.operators.evaluation import (
            hashed_ngram_embedding,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame([("abcd",)], "s string")
        vec = df.select(hashed_ngram_embedding(F.col("s"), n=3, dim=16).alias("v")).first()["v"]
        assert len(vec) == 16
        assert sum(vec) == 2.0  # 'abc', 'bcd' — one count each
