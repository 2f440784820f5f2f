"""Bloom-filter incremental dedup: exactness vs the plain anti-join,
no-false-negative construction, probe pruning, and FPR behavior."""

from __future__ import annotations

import numpy as np
import pytest

from accelerated_intelligent_document_processing_on_aws_spark.operators import dedup
from pyspark.sql import functions as F


def _hashed(spark, keys):
    return spark.createDataFrame(
        [(k,) for k in keys], "content_hash string"
    )


class TestBloomBuild:
    def test_membership_no_false_negatives(self, spark):
        keys = [f"key-{i}" for i in range(500)]
        bm = dedup.bloom_build(_hashed(spark, keys), "content_hash",
                               m_bits=1 << 16, k=7)
        # probe through the operator: every reference key must hit
        ref = _hashed(spark, keys)
        out = dedup.bloom_incremental_dedup(
            _hashed(spark, keys), ref, bm, "content_hash"
        )
        assert out.count() == 0  # all seen → all dropped

    def test_bitmap_or_is_partition_invariant(self, spark):
        keys = [f"key-{i}" for i in range(300)]
        bm1 = dedup.bloom_build(
            _hashed(spark, keys).repartition(1), "content_hash",
            m_bits=1 << 16, k=5,
        )
        bm8 = dedup.bloom_build(
            _hashed(spark, keys).repartition(8), "content_hash",
            m_bits=1 << 16, k=5,
        )
        assert bm1 == bm8

    def test_m_bits_must_be_word_aligned(self, spark):
        with pytest.raises(ValueError):
            dedup.bloom_build(_hashed(spark, ["a"]), "content_hash",
                              m_bits=100)

    def test_k_travels_in_blob_header(self, spark):
        # the probe reads k from the blob, so a build-k of 3 cannot be
        # probed with a different k (the mismatch that would create
        # false negatives is unrepresentable)
        keys = [f"k{i}" for i in range(100)]
        bm = dedup.bloom_build(_hashed(spark, keys), "content_hash",
                               m_bits=1 << 12, k=3)
        assert int(np.frombuffer(bm[:8], dtype=np.uint64)[0]) == 3
        out = dedup.bloom_incremental_dedup(
            _hashed(spark, keys), _hashed(spark, keys), bm, "content_hash"
        )
        assert out.count() == 0

    def test_headerless_blob_rejected(self, spark):
        bad = b"\x00" * 8 + b"\xff" * 64  # k=0 header
        with pytest.raises(ValueError):
            dedup.bloom_incremental_dedup(
                _hashed(spark, ["a"]), _hashed(spark, ["a"]), bad,
                "content_hash",
            )


class TestBloomIncrementalDedup:
    def test_equals_plain_anti_join(self, spark):
        # overlapping ref/incoming with duplicates inside incoming too
        ref_keys = [f"k{i}" for i in range(0, 400, 2)]       # evens
        inc_keys = [f"k{i}" for i in range(100, 500)]        # mixed
        ref = _hashed(spark, ref_keys)
        inc = _hashed(spark, inc_keys)
        # deliberately tiny bitmap → high FPR → verify join must
        # rescue every false positive
        bm = dedup.bloom_build(ref, "content_hash", m_bits=1 << 8, k=3)
        got = sorted(
            r["content_hash"]
            for r in dedup.bloom_incremental_dedup(
                inc, ref, bm, "content_hash"
            ).collect()
        )
        want = sorted(
            r["content_hash"]
            for r in inc.join(ref, "content_hash", "left_anti").collect()
        )
        assert got == want

    def test_probe_prunes_novel_majority(self, spark):
        # adequately-sized bitmap: novel keys overwhelmingly bypass
        # the verify join (measure via the probe UDF path: compare
        # survivors of the maybe-branch with true duplicates)
        ref_keys = [f"ref-{i}" for i in range(200)]
        novel_keys = [f"new-{i}" for i in range(2000)]
        ref = _hashed(spark, ref_keys)
        bm = dedup.bloom_build(ref, "content_hash", m_bits=1 << 16, k=7)
        m_bits = (len(bm) - 8) * 8  # 8-byte k header
        # expected FPR at n=200, m=65536, k=7 is ~1e-9 — assert the
        # empirical maybe-rate on novel keys stays tiny
        arr = np.frombuffer(bm[8:], dtype=np.uint64)
        assert m_bits == 1 << 16
        inc = _hashed(spark, novel_keys)
        out = dedup.bloom_incremental_dedup(inc, ref, bm, "content_hash")
        assert out.count() == len(novel_keys)
        # density sanity: 200 keys * 7 bits <= 1400 of 65536 set
        set_bits = int(sum(bin(int(w)).count("1") for w in arr))
        assert set_bits <= 200 * 7
        assert set_bits > 0

    def test_registry_query_matches_plain_semantics(self, spark):
        from accelerated_intelligent_document_processing_on_aws_spark.plans import (
            QUERIES,
        )
        import os

        sf = os.environ.get(
            "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
        )
        got = {
            r["doc_id"]
            for r in QUERIES["bloom_incremental_dedup_docs"](spark, sf).collect()
        }
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        ref = docs.where(F.col("doc_id") % 3 == 0).select(
            F.md5("text").alias("content_hash")
        )
        inc = docs.where(F.col("doc_id") % 3 != 0).select(
            "doc_id", F.md5("text").alias("content_hash")
        )
        want = {
            r["doc_id"]
            for r in inc.join(ref, "content_hash", "left_anti").collect()
        }
        assert got == want
