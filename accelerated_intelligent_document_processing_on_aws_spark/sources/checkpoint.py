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


def _replay_state(history: list[dict], upto_snapshot_id: int | None = None) -> set:
    """Reconstruct ``done_buckets`` as of a snapshot id by replaying the
    delta history (or the FULL history when ``upto_snapshot_id`` is
    None).  Entries may be delta-form (``added``/``removed``) or
    legacy full-state form (``done_buckets``) — a legacy entry simply
    resets the accumulator, so old manifests replay correctly."""
    state: set = set()
    for snap in history:
        if "done_buckets" in snap:  # legacy full-state entry
            state = set(snap["done_buckets"])
        else:
            state.difference_update(snap.get("removed", ()))
            state.update(snap.get("added", ()))
        if upto_snapshot_id is not None and snap["snapshot_id"] == upto_snapshot_id:
            return state
    if upto_snapshot_id is not None:
        raise KeyError(f"no snapshot {upto_snapshot_id}")
    return state


def _replay_data(
    history: list[dict], upto_snapshot_id: int | None = None
) -> dict:
    """Reconstruct the bucket→data-location mapping as of a snapshot id
    by replaying ``data`` deltas (``{bucket: location}``; a ``None``
    location removes the bucket).  Mirrors :func:`_replay_state` for
    the versioned-data layout."""
    mapping: dict = {}
    seen = False
    for snap in history:
        for b, loc in snap.get("data", {}).items():
            if loc is None:
                mapping.pop(b, None)
            else:
                mapping[b] = loc
        if upto_snapshot_id is not None and snap["snapshot_id"] == upto_snapshot_id:
            seen = True
            break
    if upto_snapshot_id is not None and not seen:
        raise KeyError(f"no snapshot {upto_snapshot_id}")
    return mapping


def _write_manifest(out_dir: str, manifest: dict, operation: str = "wave") -> None:
    """Atomic manifest commit, Iceberg-snapshot style: every commit gets
    a monotonically increasing ``snapshot_id`` and appends a DELTA
    entry (buckets added/removed vs the previous snapshot) to the
    ``snapshots`` history, so any prior checkpoint state is
    reconstructible (``manifest_as_of``) and the job can roll back to
    one (``rollback_to_snapshot``) — the parquet-side analog of the
    reference's workflow-keyed cache generations.  Deltas keep the
    manifest O(total bucket churn), not O(waves × n_buckets) — a
    4096-bucket wave_size-1 run stays linear, where full-state history
    entries grew quadratically (ADVICE r5).  With a real Iceberg
    catalog these commits become table snapshots and the API is
    unchanged; DATA time travel (reading old file sets) needs the
    catalog's file-level manifests and is documented as env-blocked."""
    sid = int(manifest.get("snapshot_id", 0)) + 1
    manifest["snapshot_id"] = sid
    history = manifest.setdefault("snapshots", [])
    prev = _replay_state(history)
    cur = set(manifest["done_buckets"])
    entry = {
        "snapshot_id": sid,
        "operation": operation,
        "n_buckets": manifest["n_buckets"],
    }
    added = sorted(cur - prev)
    removed = sorted(prev - cur)
    if added:
        entry["added"] = added
    if removed:
        entry["removed"] = removed
    if "data_locations" in manifest:
        # versioned-data layout: delta the bucket→location mapping too
        prev_data = _replay_data(history)
        cur_data = manifest["data_locations"]
        delta = {b: loc for b, loc in cur_data.items() if prev_data.get(b) != loc}
        delta.update({b: None for b in prev_data if b not in cur_data})
        if delta:
            entry["data"] = delta
    history.append(entry)
    p = os.path.join(out_dir, MANIFEST)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, p)  # atomic commit


def manifest_as_of(out_dir: str, snapshot_id: int) -> dict:
    """Checkpoint state as of a snapshot id (exact match required)."""
    manifest = read_manifest(out_dir)
    history = manifest.get("snapshots", [])
    try:
        state = _replay_state(history, snapshot_id)
    except KeyError:
        raise KeyError(f"no snapshot {snapshot_id} in {out_dir}") from None
    n_buckets = next(
        s["n_buckets"] for s in history if s["snapshot_id"] == snapshot_id
    )
    return {
        "done_buckets": sorted(state),
        "n_buckets": n_buckets,
        "snapshot_id": snapshot_id,
    }


def rollback_to_snapshot(
    out_dir: str, snapshot_id: int, allow_undelete: bool = False
) -> dict:
    """Roll the CURRENT checkpoint state back to a prior snapshot.

    Like Iceberg's rollback, this is itself a NEW commit (ids stay
    monotonic; history is never rewritten).  Buckets completed after
    the target snapshot become pending again; re-running the job
    re-extracts exactly those buckets via the idempotent
    partition-overwrite path, so the result is byte-stable.

    COMPLIANCE GUARD: if a ``delete_conversations`` commit exists AFTER
    the target snapshot, re-extracting the rolled-back buckets would
    silently RESURRECT the deleted conversations (the source corpus
    still contains them).  Such rollbacks are refused unless
    ``allow_undelete=True`` is passed explicitly; callers who force it
    must re-apply the audit log with :func:`replay_deletions` after the
    resumed run to restore compliance (ADVICE r5)."""
    target = manifest_as_of(out_dir, snapshot_id)
    manifest = read_manifest(out_dir)
    later_deletes = [
        s
        for s in manifest.get("snapshots", [])
        if s["snapshot_id"] > snapshot_id and s["operation"] == "delete"
    ]
    if later_deletes and not allow_undelete:
        ids = [s["snapshot_id"] for s in later_deletes]
        raise ValueError(
            f"rollback to snapshot {snapshot_id} crosses delete commit(s) "
            f"{ids}: re-extraction would resurrect deleted conversations. "
            "Pass allow_undelete=True to force, then run replay_deletions() "
            "after the resumed extraction to re-apply the deletion audit log."
        )
    manifest["done_buckets"] = sorted(target["done_buckets"])
    manifest["n_buckets"] = target["n_buckets"]
    if "data_locations" in manifest:
        # versioned-data layout: restore the bucket→location mapping —
        # the rolled-back state is READABLE immediately (old files were
        # never mutated), no re-extraction required.
        manifest["data_locations"] = _replay_data(
            manifest.get("snapshots", []), snapshot_id
        )
    _write_manifest(out_dir, manifest, operation=f"rollback_to_{snapshot_id}")
    return manifest


def replay_deletions(spark: SparkSession, out_dir: str) -> dict:
    """Re-apply every logged ``delete_conversations`` audit entry to the
    current extracted output — the recovery step after a forced
    rollback (``allow_undelete=True``) + resume re-extracted buckets
    containing conversations that had been deleted.  Idempotent: a
    conversation already absent deletes zero rows.  Returns the merged
    ``{bucket: n_deleted}`` across all replayed entries."""
    manifest = read_manifest(out_dir)
    all_ids = sorted(
        {c for entry in manifest.get("deletions", []) for c in entry["conv_ids"]}
    )
    if not all_ids:
        return {}
    return delete_conversations(spark, out_dir, all_ids)


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


# -- Iceberg-style DATA time travel on plain parquet --------------------------
#
# The metadata layer above (numbered snapshots, delta history, as-of
# reconstruction, rollback-as-new-commit) has always been the
# parquet-manifest analog of Iceberg snapshots; what it could NOT do
# without the real catalog was read an OLD file set, because the wave
# writer and the deleter mutated bucket directories in place.  The
# versioned layout below closes that at the semantics level using
# Iceberg's actual mechanism — immutable data files + snapshot-scoped
# location pointers — on plain parquet:
#
#   out/data/v=<sid>/bucket_pt=<K>/part-*.parquet   (never rewritten)
#
# Every commit that changes a bucket's data writes NEW directories
# under the about-to-be-allocated snapshot id and repoints the
# manifest's ``data_locations`` mapping; the snapshot history carries
# the mapping as deltas, so ``read_snapshot(spark, out, sid)`` replays
# to that snapshot's exact file set and reads it in ONE multi-path
# parquet scan (column pruning / predicate pushdown intact).  Deletes
# rewrite only affected buckets to new locations — prior snapshots
# still see the deleted rows, exactly like Iceberg, and the hard-delete
# story is :func:`expire_snapshots` (GC of exclusively-old file sets).
# When the real Iceberg runtime is available these become catalog
# operations with the same semantics; the layout is the documented
# fallback, not a fork of the API.
#
# Reference analog: the workflow-keyed cache generations + S3 object
# versioning the reference leans on for reprocessing
# (``classification/service.py:1627-1778``, ``delete_documents.py:286-420``).


def _data_loc(sid: int, bucket: int) -> str:
    return f"v={sid}/bucket_pt={bucket}"


def run_versioned_extraction(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    n_buckets: int = 8,
    wave_size: int = 4,
    fail_after_waves: int | None = None,
    salt: int = 8,
) -> str:
    """Checkpointed extraction with the VERSIONED data layout: each
    wave writes its buckets under the new snapshot's ``v=<sid>/``
    prefix (one partitioned write job per wave, never touching prior
    files) and commits the manifest only after the write succeeds.
    Crash recovery: an orphaned ``v=<sid>`` directory from a commit
    that never landed is simply overwritten on retry (same sid is
    re-allocated) and is otherwise invisible — no snapshot references
    it — until :func:`expire_snapshots` garbage-collects it."""
    os.makedirs(out_dir, exist_ok=True)
    manifest = read_manifest(out_dir)
    if manifest["n_buckets"] not in (None, n_buckets):
        raise ValueError("n_buckets changed across resume")
    if manifest.get("stream_batches"):
        raise ValueError(
            f"{out_dir} holds streaming snapshot commits; bucket waves "
            "would mix layouts — use a separate output"
        )
    manifest["n_buckets"] = n_buckets
    done = set(manifest["done_buckets"])
    data = dict(manifest.get("data_locations", {}))
    pending = [b for b in range(n_buckets) if b not in done]

    src = transcripts.withColumn("bucket", bucket_col(n_buckets))
    waves = [pending[i : i + wave_size] for i in range(0, len(pending), wave_size)]
    for wi, wave in enumerate(waves):
        if fail_after_waves is not None and wi >= fail_after_waves:
            raise RuntimeError("injected crash for resume test")
        sid_next = int(manifest.get("snapshot_id", 0)) + 1
        part = src.where(F.col("bucket").isin(wave)).drop("bucket")
        extracted = (
            extract_turns(part, salt=salt)
            .withColumn("bucket", bucket_col(n_buckets))
            .withColumn("bucket_pt", bucket_col(n_buckets))
        )
        extracted.cache()
        # bucket_pt drives the directory layout; bucket stays a REGULAR
        # column inside the files so a multi-path snapshot read needs no
        # partition-discovery basePath gymnastics.
        drop_internal(extracted).write.mode("overwrite").partitionBy(
            "bucket_pt"
        ).parquet(os.path.join(out_dir, "data", f"v={sid_next}"))
        # clear the wave's prior lineage partitions before the append
        # (mirroring run_checkpointed_extraction): a wave RE-RUN —
        # rollback_to_snapshot + resume, or a crash between this append
        # and the manifest commit — must not duplicate lineage rows
        # (r7 ADVICE: reproduced growing 24 → 36 rows).
        for b in wave:
            shutil.rmtree(
                os.path.join(out_dir, "lineage", f"bucket={b}"),
                ignore_errors=True,
            )
        lin = lineage(extracted.drop("bucket_pt"), by=("bucket",))
        lin.write.mode("append").partitionBy("bucket").parquet(
            os.path.join(out_dir, "lineage")
        )
        extracted.unpersist()
        done.update(wave)
        for b in wave:
            # record only locations partitionBy actually created — a
            # bucket with zero rows writes no directory, and a dangling
            # pointer makes every later read_snapshot raise (r7 ADVICE:
            # reproduced with 2 conversations / n_buckets=16).  An
            # unmapped bucket reads as empty, which is exactly right.
            if os.path.isdir(os.path.join(out_dir, "data", _data_loc(sid_next, b))):
                data[str(b)] = _data_loc(sid_next, b)
        manifest["done_buckets"] = sorted(done)
        manifest["data_locations"] = data
        _write_manifest(out_dir, manifest, operation=f"wave:{sorted(wave)}")
        assert manifest["snapshot_id"] == sid_next  # single-writer invariant
    return out_dir


def read_snapshot(
    spark: SparkSession, out_dir: str, snapshot_id: int | None = None
) -> DataFrame:
    """Read the extracted table AS OF a snapshot id (default: latest) —
    data-level time travel.  One ``spark.read.parquet(path, ...)`` over
    the snapshot's exact per-bucket file set; raises ``KeyError`` for
    an unknown snapshot and ``ValueError`` for one whose data has been
    expired."""
    manifest = read_manifest(out_dir)
    history = manifest.get("snapshots", [])
    if snapshot_id is not None and snapshot_id in manifest.get(
        "expired_snapshots", []
    ):
        raise ValueError(f"snapshot {snapshot_id} has been expired")
    if snapshot_id is None:
        mapping = manifest.get("data_locations")
        if mapping is None:
            mapping = _replay_data(history)
    else:
        mapping = _replay_data(history, snapshot_id)
    if not mapping:
        raise ValueError(f"{out_dir} has no versioned data snapshots")
    paths = [os.path.join(out_dir, "data", loc) for loc in mapping.values()]
    missing = [p for p in paths if not os.path.isdir(p)]
    if missing:
        raise ValueError(
            f"snapshot {snapshot_id}: {len(missing)} data location(s) "
            f"missing (expired or corrupted), e.g. {missing[0]}"
        )
    return spark.read.parquet(*sorted(paths))


def delete_conversations_versioned(
    spark: SparkSession,
    out_dir: str,
    conv_ids: list[str],
    dry_run: bool = False,
) -> dict:
    """Versioned-layout conversation deletion: affected buckets are
    rewritten (anti-filtered) to NEW ``v=<sid>`` locations and the
    mapping repointed — O(affected buckets) work, prior snapshots
    untouched and still readable.  Like Iceberg, this is a LOGICAL
    delete until old snapshots are expired; for a hard delete (the
    reference's ``delete_documents.py`` compliance path) follow with
    ``expire_snapshots(out_dir, keep_from=<this commit's sid>)``."""
    manifest = read_manifest(out_dir)
    n_buckets = manifest["n_buckets"]
    data = dict(manifest.get("data_locations", {}))
    if manifest.get("stream_batches"):
        raise ValueError(
            f"{out_dir} holds stream-committed snapshots (no hash-bucket "
            "targeting); filter-rewrite the batch locations instead"
        )
    if n_buckets is None or not data:
        raise ValueError(f"{out_dir} has no versioned extraction manifest")
    sid_next = int(manifest.get("snapshot_id", 0)) + 1
    ids_df = spark.createDataFrame([(c,) for c in conv_ids], "conv_id string")
    buckets = sorted(
        r["b"]
        for r in ids_df.select(bucket_col(n_buckets).alias("b")).distinct().collect()
    )
    deleted: dict[int, int] = {}
    for b in buckets:
        loc = data.get(str(b))
        if loc is None:
            continue
        df = spark.read.parquet(os.path.join(out_dir, "data", loc))
        n = df.where(F.col("conv_id").isin(conv_ids)).count()
        if n == 0:
            continue
        deleted[b] = n
        if dry_run:
            continue
        keep = df.where(~F.col("conv_id").isin(conv_ids))
        if keep.limit(1).count() == 0:
            # every row of the bucket was deleted: emit a mapping
            # REMOVAL ({bucket: null} in the snapshot delta) instead of
            # pointing at a freshly written empty directory —
            # read_incremental over only that location would fail
            # schema inference, and the mapping would keep a useless
            # entry forever (r7 ADVICE).
            data.pop(str(b), None)
            continue
        keep.write.mode("overwrite").parquet(
            os.path.join(out_dir, "data", _data_loc(sid_next, b))
        )
        data[str(b)] = _data_loc(sid_next, b)
    if deleted and not dry_run:
        manifest["data_locations"] = data
        manifest.setdefault("deletions", []).append(
            {
                "conv_ids": sorted(conv_ids),
                "rows_by_bucket": {str(k): v for k, v in deleted.items()},
            }
        )
        _write_manifest(out_dir, manifest, operation="delete")
        assert manifest["snapshot_id"] == sid_next
    return deleted


def expire_snapshots(out_dir: str, keep_from: int) -> dict:
    """Expire every snapshot with id < ``keep_from``: their ids become
    unreadable and any ``v=*/bucket_pt=*`` data directory referenced by
    NO kept snapshot (and not by the current mapping) is deleted from
    disk — including orphans from crashed commits.  History entries are
    retained (they are O(churn) deltas and later snapshots replay
    through them); only DATA is collected, exactly Iceberg's
    expire-snapshots contract.  Returns ``{"expired": [...ids],
    "removed_locations": [...]}``."""
    manifest = read_manifest(out_dir)
    history = manifest.get("snapshots", [])
    all_ids = [s["snapshot_id"] for s in history]
    expired_prior = set(manifest.get("expired_snapshots", []))
    to_expire = [
        sid for sid in all_ids if sid < keep_from and sid not in expired_prior
    ]
    kept_ids = [sid for sid in all_ids if sid >= keep_from]
    referenced: set = set(manifest.get("data_locations", {}).values())
    for sid in kept_ids:
        referenced.update(_replay_data(history, sid).values())
    data_root = os.path.join(out_dir, "data")
    removed: list[str] = []
    if os.path.isdir(data_root):
        for vdir in sorted(os.listdir(data_root)):
            vpath = os.path.join(data_root, vdir)
            if not os.path.isdir(vpath):
                continue
            for bdir in sorted(os.listdir(vpath)):
                if not os.path.isdir(os.path.join(vpath, bdir)):
                    continue  # _SUCCESS and other commit markers
                loc = f"{vdir}/{bdir}"
                if loc not in referenced:
                    shutil.rmtree(os.path.join(vpath, bdir))
                    removed.append(loc)
            if not any(
                os.path.isdir(os.path.join(vpath, e)) for e in os.listdir(vpath)
            ):  # version dir fully collected — markers go with it
                shutil.rmtree(vpath)
    manifest["expired_snapshots"] = sorted(expired_prior | set(to_expire))
    _write_manifest(out_dir, manifest, operation=f"expire_below_{keep_from}")
    return {"expired": to_expire, "removed_locations": removed}


def compact_snapshot(
    spark: SparkSession, out_dir: str, target_file_mb: int = 128
) -> dict:
    """Iceberg ``rewrite_data_files`` analog on the versioned layout:
    every bucket whose current location holds more parquet files than
    its bytes justify is rewritten (coalesced toward ``target_file_mb``
    per file) into a NEW ``v=<sid>`` location, all repointed in ONE
    commit.  Row content is unchanged and prior snapshots are untouched
    — the pre-compaction file sets remain readable until
    :func:`expire_snapshots` collects them.  Small-file pressure is the
    classic failure mode of a long-running wave/delete cadence at
    10^12-turn scale; compaction keeps scan task counts proportional to
    bytes, not to commit history.  Returns ``{bucket: (files_before,
    files_after)}`` for the buckets actually rewritten."""
    manifest = read_manifest(out_dir)
    data = dict(manifest.get("data_locations", {}))
    if not data:
        raise ValueError(f"{out_dir} has no versioned extraction manifest")
    sid_next = int(manifest.get("snapshot_id", 0)) + 1
    target_bytes = target_file_mb * 1024 * 1024
    changed: dict = {}
    for b, loc in sorted(data.items()):
        path = os.path.join(out_dir, "data", loc)
        files = [f for f in os.listdir(path) if f.endswith(".parquet")]
        total = sum(os.path.getsize(os.path.join(path, f)) for f in files)
        n_target = max(1, -(-total // target_bytes))  # ceil div
        if n_target >= len(files):
            continue
        new_loc = f"v={sid_next}/bucket_pt={b}"  # key is opaque (bucket or batch)
        spark.read.parquet(path).coalesce(int(n_target)).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "data", new_loc))
        data[b] = new_loc
        changed[b] = (len(files), int(n_target))
    if changed:
        manifest["data_locations"] = data
        _write_manifest(out_dir, manifest, operation="compact")
        assert manifest["snapshot_id"] == sid_next
    return changed


def read_incremental(
    spark: SparkSession, out_dir: str, since_snapshot_id: int,
    upto_snapshot_id: int | None = None,
) -> DataFrame:
    """Iceberg incremental-scan analog: read ONLY the rows whose bucket
    data changed in snapshots ``(since_snapshot_id, upto_snapshot_id]``
    — the pattern a downstream consumer uses to process each commit's
    new work without rescanning the corpus.  A bucket rewritten by a
    delete/compaction commit surfaces in full (its current file set is
    the change unit — same semantics as Iceberg's changelog at
    file granularity).  Raises ``KeyError`` for unknown snapshot ids;
    returns an empty frame when nothing changed in the range."""
    manifest = read_manifest(out_dir)
    history = manifest.get("snapshots", [])
    known = {s["snapshot_id"] for s in history}
    upto = (
        max(known) if upto_snapshot_id is None else upto_snapshot_id
    )
    for sid in (since_snapshot_id, upto):
        if sid not in known:
            raise KeyError(f"no snapshot {sid} in {out_dir}")
    changed: dict = {}
    for snap in history:
        if since_snapshot_id < snap["snapshot_id"] <= upto:
            for b, loc in snap.get("data", {}).items():
                if loc is None:
                    changed.pop(b, None)
                else:
                    changed[b] = loc
    # a location superseded WITHIN the range collapses to its latest —
    # but only locations still current AS OF `upto` are readable state
    as_of = _replay_data(history, upto)
    paths = [
        os.path.join(out_dir, "data", loc)
        for b, loc in changed.items()
        if as_of.get(b) == loc
    ]
    if not paths:
        return read_snapshot(spark, out_dir, upto).limit(0)
    missing = [p for p in paths if not os.path.isdir(p)]
    if missing:
        raise ValueError(
            f"incremental range ({since_snapshot_id}, {upto}]: "
            f"{len(missing)} changed location(s) expired, e.g. {missing[0]}"
        )
    return spark.read.parquet(*sorted(paths))


def versioned_stream_sink(out_dir: str, salt: int = 8):
    """Streaming ingestion into the versioned layout — the Iceberg
    streaming-sink analog: returns a ``foreachBatch`` function that
    extracts each micro-batch of transcript turns and commits it as ONE
    snapshot (location key ``batch-<id>``), with EXACTLY-ONCE semantics
    on top of foreachBatch's at-least-once contract: committed batch
    ids are recorded inside the same atomic manifest commit as the data
    pointer, so a replayed micro-batch is recognized and skipped, and a
    crash between data write and manifest commit leaves only an orphan
    directory (invisible; collected by :func:`expire_snapshots`).

    Streaming outputs are append-only snapshot units, not hash buckets
    — do not mix with the wave writer in one output directory
    (:func:`run_versioned_extraction` refuses).  ``read_snapshot`` /
    ``read_incremental`` / ``compact_snapshot`` / ``expire_snapshots``
    work unchanged (they treat mapping keys opaquely)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        os.makedirs(out_dir, exist_ok=True)
        manifest = read_manifest(out_dir)
        if manifest["n_buckets"] is not None:
            raise ValueError(
                f"{out_dir} holds a bucket-wave extraction; streaming "
                "commits would mix layouts — use a separate output"
            )
        if int(batch_id) in manifest.get("stream_batches", []):
            return  # at-least-once redelivery: already committed
        sid_next = int(manifest.get("snapshot_id", 0)) + 1
        loc = f"v={sid_next}/batch={int(batch_id)}"
        extracted = extract_turns(batch_df, salt=salt)
        drop_internal(extracted).write.mode("overwrite").parquet(
            os.path.join(out_dir, "data", loc)
        )
        data = dict(manifest.get("data_locations", {}))
        data[f"batch-{int(batch_id)}"] = loc
        manifest["data_locations"] = data
        manifest.setdefault("stream_batches", []).append(int(batch_id))
        _write_manifest(
            out_dir, manifest, operation=f"stream_batch:{int(batch_id)}"
        )

    return write_batch
