"""SemDeDup: planted-cluster semantics + the registry query's
one-per-pair property."""

from __future__ import annotations

import os

from accelerated_intelligent_document_processing_on_aws_spark.operators import (
    similarity,
)
from pyspark.sql import functions as F

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


class TestSemanticDedup:
    def test_planted_groups_keep_one_each(self, spark):
        # two tight semantic groups around orthogonal directions plus
        # two singletons; fixed centroids at the group directions
        g1 = [[1.0, 0.0, 0.0, 0.0], [0.999, 0.01, 0.0, 0.0], [0.998, 0.02, 0.0, 0.0]]
        g2 = [[0.0, 1.0, 0.0, 0.0], [0.01, 0.999, 0.0, 0.0]]
        single = [[0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0]]
        rows = [(i, v) for i, v in enumerate(g1 + g2 + single)]
        cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
                 [0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0]]
        kept = similarity.semantic_dedup(
            _emb(spark, rows), cents, threshold=0.99
        )
        ids = sorted(r["vec_id"] for r in kept.collect())
        # one survivor per group + both singletons = 4 rows
        assert len(ids) == 4
        assert 5 in ids and 6 in ids  # singletons untouched
        assert len([i for i in ids if i <= 2]) == 1
        assert len([i for i in ids if i in (3, 4)]) == 1

    def test_keeps_farthest_from_centroid(self, spark):
        # group members at increasing distance from the centroid: the
        # SemDeDup keep rule retains the FARTHEST (most atypical)
        rows = [
            (0, [1.0, 0.0]),        # d2 = 0       (closest)
            (1, [0.96, 0.01]),      # farther
            (2, [0.90, 0.02]),      # farthest → kept
        ]
        cents = [[1.0, 0.0], [-1.0, 0.0]]
        kept = similarity.semantic_dedup(
            _emb(spark, rows), cents, threshold=0.99
        )
        assert [r["vec_id"] for r in kept.collect()] == [2]

    def test_cross_cluster_pairs_not_considered(self, spark):
        # identical vectors FORCED into different lists never pair —
        # the documented intra-cluster approximation
        rows = [(0, [1.0, 0.0]), (1, [1.0, 0.0])]
        kept = similarity.semantic_dedup(
            _emb(spark, rows), [[1.0, 0.0], [-1.0, 0.0]], threshold=0.99
        )
        assert kept.count() == 1  # same list → deduped
        # but with centroids so far apart both land in list 0 anyway;
        # the approximation property is structural (block_col join)


class TestRegistryQuery:
    def test_one_dropped_per_planted_pair(self, spark):
        from accelerated_intelligent_document_processing_on_aws_spark.plans import (
            QUERIES,
        )

        e = spark.read.parquet(f"{SF}/embeddings.parquet")
        n = e.count()
        n_planted = e.where(F.col("vec_id") % 7 == 0).count()
        out = QUERIES["semantic_dedup_keep"](spark, SF)
        rows = out.collect()
        # exactly one member of each planted pair dropped
        assert len(rows) == n + n_planted - n_planted == n
        kept_ids = {r["vec_id"] for r in rows}
        for r in e.where(F.col("vec_id") % 7 == 0).collect():
            pair = {r["vec_id"], r["vec_id"] + 1000000}
            assert len(pair & kept_ids) == 1, pair
