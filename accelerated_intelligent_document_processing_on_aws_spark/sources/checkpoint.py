"""Idempotent checkpoint/resume for the extraction job.

The reference resumes by caching per-document classification results in
DynamoDB keyed ``classcache#{doc}#{workflow}`` and skipping completed
stages (``classification/service.py:1627-1778``;
``patterns/pattern-2/src/classification_function/index.py:60-80``).
The Spark-native restatement: conversations hash into ``n_buckets``
fixed buckets; the job processes buckets in waves, writes each wave
with dynamic partition overwrite (idempotent — a re-run of a wave
replaces, never duplicates), and appends the bucket ids to a manifest
only after the write commits.  Resume = set difference on the manifest,
i.e. a driver-side anti-join on a tiny key set.  With an Iceberg
catalog the manifest becomes snapshot metadata; the API is unchanged.

This mirrors at-least-once Lambda + idempotent S3 overwrite semantics
while keeping recovery O(pending work), not O(corpus).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import drop_internal, extract_turns, lineage

MANIFEST = "_manifest.json"


def bucket_col(n_buckets: int):
    return F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")


def read_manifest(out_dir: str) -> dict:
    p = os.path.join(out_dir, MANIFEST)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"done_buckets": [], "n_buckets": None, "snapshot_id": 0, "snapshots": []}


def _write_manifest(out_dir: str, manifest: dict, operation: str = "wave") -> None:
    """Atomic manifest commit, Iceberg-snapshot style: every commit gets
    a monotonically increasing ``snapshot_id`` and appends its state to
    the ``snapshots`` history, so any prior checkpoint state is
    reconstructible (``manifest_as_of``) and the job can roll back to
    one (``rollback_to_snapshot``) — the parquet-side analog of the
    reference's workflow-keyed cache generations.  With a real Iceberg
    catalog these commits become table snapshots and the API is
    unchanged; DATA time travel (reading old file sets) needs the
    catalog's file-level manifests and is documented as env-blocked."""
    sid = int(manifest.get("snapshot_id", 0)) + 1
    manifest["snapshot_id"] = sid
    history = manifest.setdefault("snapshots", [])
    history.append(
        {
            "snapshot_id": sid,
            "operation": operation,
            "done_buckets": sorted(manifest["done_buckets"]),
            "n_buckets": manifest["n_buckets"],
        }
    )
    p = os.path.join(out_dir, MANIFEST)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, p)  # atomic commit


def manifest_as_of(out_dir: str, snapshot_id: int) -> dict:
    """Checkpoint state as of a snapshot id (exact match required)."""
    manifest = read_manifest(out_dir)
    for snap in manifest.get("snapshots", []):
        if snap["snapshot_id"] == snapshot_id:
            return {
                "done_buckets": list(snap["done_buckets"]),
                "n_buckets": snap["n_buckets"],
                "snapshot_id": snapshot_id,
            }
    raise KeyError(f"no snapshot {snapshot_id} in {out_dir}")


def rollback_to_snapshot(out_dir: str, snapshot_id: int) -> dict:
    """Roll the CURRENT checkpoint state back to a prior snapshot.

    Like Iceberg's rollback, this is itself a NEW commit (ids stay
    monotonic; history is never rewritten).  Buckets completed after
    the target snapshot become pending again; re-running the job
    re-extracts exactly those buckets via the idempotent
    partition-overwrite path, so the result is byte-stable."""
    target = manifest_as_of(out_dir, snapshot_id)
    manifest = read_manifest(out_dir)
    manifest["done_buckets"] = sorted(target["done_buckets"])
    manifest["n_buckets"] = target["n_buckets"]
    _write_manifest(out_dir, manifest, operation=f"rollback_to_{snapshot_id}")
    return manifest


def run_checkpointed_extraction(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    n_buckets: int = 8,
    wave_size: int = 4,
    fail_after_waves: int | None = None,
    salt: int = 8,
) -> str:
    """Extract with bucket-wave checkpointing; returns the output dir.

    ``fail_after_waves`` injects a crash for the resume test (§5(e)).
    Output layout: ``out_dir/extracted/bucket=K/...`` plus
    ``out_dir/lineage/bucket=K/...`` and the manifest.
    """
    os.makedirs(out_dir, exist_ok=True)
    manifest = read_manifest(out_dir)
    if manifest["n_buckets"] not in (None, n_buckets):
        raise ValueError("n_buckets changed across resume")
    manifest["n_buckets"] = n_buckets
    done = set(manifest["done_buckets"])
    pending = [b for b in range(n_buckets) if b not in done]

    src = transcripts.withColumn("bucket", bucket_col(n_buckets))
    waves = [pending[i : i + wave_size] for i in range(0, len(pending), wave_size)]
    for wi, wave in enumerate(waves):
        if fail_after_waves is not None and wi >= fail_after_waves:
            raise RuntimeError("injected crash for resume test")
        part = src.where(F.col("bucket").isin(wave)).drop("bucket")
        extracted = extract_turns(part, salt=salt).withColumn(
            "bucket", bucket_col(n_buckets)
        )
        # Idempotent overwrite of exactly this wave's bucket partitions.
        for b in wave:
            for sub in ("extracted", "lineage"):
                shutil.rmtree(os.path.join(out_dir, sub, f"bucket={b}"), ignore_errors=True)
        extracted.cache()
        drop_internal(extracted).write.mode("append").partitionBy("bucket").parquet(
            os.path.join(out_dir, "extracted")
        )
        # lineage rows carry their REAL bucket (grouped by it) so the
        # lineage partition layout matches the extracted table — round 1
        # wrote the whole wave under bucket=min(wave), leaving the other
        # wave members' lineage partitions empty
        lin = lineage(extracted, by=("bucket",))
        lin.write.mode("append").partitionBy("bucket").parquet(
            os.path.join(out_dir, "lineage")
        )
        extracted.unpersist()
        done.update(wave)
        manifest["done_buckets"] = sorted(done)
        _write_manifest(out_dir, manifest, operation=f"wave:{sorted(wave)}")
    return out_dir


def resume_pending(out_dir: str, n_buckets: int) -> list[int]:
    done = set(read_manifest(out_dir)["done_buckets"])
    return [b for b in range(n_buckets) if b not in done]


def delete_conversations(
    spark: SparkSession,
    out_dir: str,
    conv_ids: list[str],
    dry_run: bool = False,
) -> dict:
    """Document-deletion analog (``delete_documents.py:286-420``): remove
    every extracted artifact of the given conversations from the
    checkpointed output.

    The reference computes a timestamp shard to find exactly the
    DynamoDB entries a document can live in; the Spark restatement
    computes each conversation's hash BUCKET and rewrites only those
    partitions with an anti-filter — touched data is O(affected
    buckets), never O(corpus).  ``dry_run`` reports what would be
    deleted without rewriting (reference ``:303``).

    Lineage partitions are left as written: lineage is the processing
    history of the original run (what the kernel did), not a live row
    inventory; deletions are instead recorded in the manifest's
    ``deletions`` audit list.  Returns ``{bucket: n_deleted}``.
    """
    manifest = read_manifest(out_dir)
    n_buckets = manifest["n_buckets"]
    if n_buckets is None:
        raise ValueError(f"{out_dir} has no completed extraction manifest")
    ids_df = spark.createDataFrame([(c,) for c in conv_ids], "conv_id string")
    buckets = sorted(
        r["b"]
        for r in ids_df.select(bucket_col(n_buckets).alias("b")).distinct().collect()
    )
    deleted: dict[int, int] = {}
    for b in buckets:
        part_dir = os.path.join(out_dir, "extracted", f"bucket={b}")
        if not os.path.isdir(part_dir):
            continue
        df = spark.read.parquet(part_dir)
        n = df.where(F.col("conv_id").isin(conv_ids)).count()
        if n == 0:
            continue
        deleted[b] = n
        if dry_run:
            continue
        keep = df.where(~F.col("conv_id").isin(conv_ids))
        tmp_dir = part_dir + ".rewrite"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        keep.write.mode("overwrite").parquet(tmp_dir)  # materialize FIRST
        shutil.rmtree(part_dir)
        os.replace(tmp_dir, part_dir)
    if deleted and not dry_run:
        manifest.setdefault("deletions", []).append(
            {"conv_ids": sorted(conv_ids), "rows_by_bucket": {str(k): v for k, v in deleted.items()}}
        )
        _write_manifest(out_dir, manifest, operation="delete")
    return deleted
