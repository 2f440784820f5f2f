"""Round-8 regression pins for the three r7 ADVICE findings on the
versioned layout (``sources/checkpoint.py``):

1. wave re-run (rollback + resume) must NOT duplicate lineage rows —
   the versioned path now clears the wave's lineage partitions before
   appending, mirroring the non-versioned path;
2. a bucket with zero rows must not leave a dangling data-location
   pointer (partitionBy creates no directory for it) — unmapped
   buckets read as empty;
3. deleting EVERY row of a bucket must emit a mapping removal
   ({bucket: null} delta), not a pointer to an empty directory.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from accelerated_intelligent_document_processing_on_aws_spark.sources.checkpoint import (
    delete_conversations_versioned,
    read_manifest,
    read_snapshot,
    rollback_to_snapshot,
    run_versioned_extraction,
)


def _mk_corpus(spark, n_convs):
    from accelerated_intelligent_document_processing_on_aws_spark.fixtures.transcripts import (
        generate_transcripts,
    )

    rows = generate_transcripts(n_convs, seed=31)
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp",
    )


def test_rollback_resume_does_not_duplicate_lineage(spark, tmp_path):
    src = _mk_corpus(spark, 24)
    out = str(tmp_path / "run")
    run_versioned_extraction(spark, src, out, n_buckets=4, wave_size=2, salt=4)
    lin = spark.read.parquet(os.path.join(out, "lineage"))
    base = lin.count()
    base_max_per_bucket = (
        lin.groupBy("bucket").count().agg(F.max("count")).first()[0]
    )
    rollback_to_snapshot(out, 1)
    run_versioned_extraction(spark, src, out, n_buckets=4, wave_size=2, salt=4)
    lin2 = spark.read.parquet(os.path.join(out, "lineage"))
    assert lin2.count() == base, "wave re-run duplicated lineage rows"
    # per-bucket lineage stays one generation deep
    per_bucket = (
        lin2.groupBy("bucket").count().agg(F.max("count")).first()[0]
    )
    assert per_bucket == base_max_per_bucket


def test_empty_bucket_leaves_no_dangling_pointer(spark, tmp_path):
    # 2 conversations over 16 buckets: most buckets are EMPTY
    src = _mk_corpus(spark, 2)
    out = str(tmp_path / "run")
    run_versioned_extraction(spark, src, out, n_buckets=16, wave_size=16, salt=4)
    m = read_manifest(out)
    # every recorded location must exist on disk
    for loc in m["data_locations"].values():
        assert os.path.isdir(os.path.join(out, "data", loc)), loc
    # and the snapshot must be readable with full row parity
    got = read_snapshot(spark, out)
    assert got.count() == src.count()


def test_full_bucket_delete_removes_mapping(spark, tmp_path):
    src = _mk_corpus(spark, 12)
    out = str(tmp_path / "run")
    run_versioned_extraction(spark, src, out, n_buckets=2, wave_size=2, salt=4)
    m = read_manifest(out)
    # find every conv in bucket 0 and delete them all
    snap = read_snapshot(spark, out)
    bucket0 = [
        r["conv_id"]
        for r in snap.where(F.col("bucket") == 0).select("conv_id").distinct().collect()
    ]
    assert bucket0, "fixture must place conversations in bucket 0"
    delete_conversations_versioned(spark, out, bucket0)
    m2 = read_manifest(out)
    assert "0" not in m2["data_locations"], "emptied bucket must unmap"
    # the commit's delta records the removal as null
    last = m2["snapshots"][-1]
    assert last["data"].get("0", "missing") is None
    # remaining data still reads, with bucket 0 gone
    got = read_snapshot(spark, out)
    assert got.where(F.col("bucket") == 0).count() == 0
    assert got.count() == snap.count() - snap.where(F.col("bucket") == 0).count()


def test_simhash_salted_join_covers_oversalt_buckets(spark):
    """Round-8 pin for the 2-D salted pair join in simhash_pairs: a
    bucket LARGER than the 256-member salt target (ns > 1, so both
    sides genuinely fan out over group pairs) must still emit every
    unordered pair exactly once.  600 identical docs → every chunk
    bucket has 600 members, ns = 3; expect C(600,2) hamming-0 pairs
    and no duplicates from the 8 chunk indexes or the 3×3 group grid."""
    from accelerated_intelligent_document_processing_on_aws_spark.operators import (
        dedup,
    )

    n = 600
    docs = spark.createDataFrame(
        [(i, "same exact tokens all the way down " * 3) for i in range(n)],
        "doc_id int, text string",
    )
    out = dedup.simhash_pairs(docs, max_hamming=7).collect()
    assert len(out) == n * (n - 1) // 2
    pairs = {(r["id_a"], r["id_b"]) for r in out}
    assert len(pairs) == n * (n - 1) // 2  # exactly once each
    assert all(r["id_a"] < r["id_b"] and r["hamming"] == 0 for r in out)
