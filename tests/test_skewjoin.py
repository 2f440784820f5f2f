"""Salted-join equivalence and bucketed co-located join (shuffle-free)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark.operators.skewjoin import (
    salted_join,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


class TestSaltedJoin:
    @pytest.fixture(scope="class")
    def skewed(self, spark):
        # one hot key carrying 5k rows, 50 cold keys with a handful each
        hot = spark.range(5000).select(
            F.lit("hot").alias("k"), F.col("id").alias("v")
        )
        cold = spark.range(200).select(
            F.concat(F.lit("c"), (F.col("id") % 50)).alias("k"),
            F.col("id").alias("v"),
        )
        left = hot.unionAll(cold)
        right = spark.createDataFrame(
            [("hot", 1.0)] + [(f"c{i}", float(i)) for i in range(40)],
            "k string, w double",
        )
        return left, right

    def test_inner_equivalence(self, spark, skewed):
        left, right = skewed
        plain = left.join(right, "k", "inner")
        salted = salted_join(left, right, "k", salt=8, how="inner")
        cols = ["k", "v", "w"]
        assert _rows(salted.select(cols), cols) == _rows(plain.select(cols), cols)

    def test_left_equivalence_keeps_unmatched(self, spark, skewed):
        left, right = skewed
        plain = left.join(right, "k", "left")
        salted = salted_join(left, right, "k", salt=8, how="left")
        cols = ["k", "v", "w"]
        assert _rows(salted.select(cols), cols) == _rows(plain.select(cols), cols)

    def test_salt_actually_spreads_hot_key(self, spark, skewed):
        left, _ = skewed
        lcols = [F.col(c) for c in left.columns]
        n_subkeys = (
            left.where(F.col("k") == "hot")
            .select(F.pmod(F.xxhash64(*lcols), F.lit(8)).alias("s"))
            .distinct()
            .count()
        )
        assert n_subkeys == 8  # 5k rows hash into all 8 sub-keys

    def test_rejects_unsupported(self, spark, skewed):
        left, right = skewed
        with pytest.raises(ValueError):
            salted_join(left, right, "k", salt=8, how="full")
        with pytest.raises(ValueError):
            salted_join(left, right, "k", salt=0)


class TestBucketedJoin:
    def test_bucketed_tables_join_without_exchange(self, spark, tmp_path):
        """Both sides bucketed by the join key into the same bucket
        count → the join plans with NO Exchange: the co-location a
        100 TB fact-to-fact join needs (bucket the table ONCE at write,
        every later join skips its shuffle)."""
        spark.sql("DROP TABLE IF EXISTS bj_left")
        spark.sql("DROP TABLE IF EXISTS bj_right")
        left = spark.range(10_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("a")
        )
        right = spark.range(10_000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("b")
        )
        left.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable(
            "bj_left"
        )
        right.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable(
            "bj_right"
        )
        joined = (
            spark.table("bj_left")
            .hint("merge")  # force SMJ so bucket co-location is what's tested
            .join(spark.table("bj_right"), "k")
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan
        assert joined.count() == 10_000
        spark.sql("DROP TABLE IF EXISTS bj_left")
        spark.sql("DROP TABLE IF EXISTS bj_right")
