"""Manifest-based snapshot table format: versioned parquet with
atomic commits, time travel, rollback, and vacuum.

The staging.py swap gives crash safety for a single live copy; a
transactional table format (Delta/Iceberg — which this sandbox cannot
run, see README) additionally gives *versions*: readers pin a
snapshot, writers publish a new one atomically, and old snapshots stay
readable until vacuumed. This module provides that contract on plain
parquet + JSON manifests, the Iceberg v1 idea reduced to its core:

- layout::

      table/
        data/v00003-000.parquet     # immutable once written
        _manifests/v00001.json      # full file listing per version
        _manifests/v00002.json
        _manifests/v00003.json

- a commit writes its data files FIRST (under names no manifest
  references yet), then publishes the manifest via write-temp +
  atomic ``os.replace``. A crash at any point leaves every prior
  version intact; the worst case is orphan data files, which vacuum
  removes. The current version is simply the highest manifest — no
  mutable pointer file, so there is no pointer to corrupt.
- data files are IMMUTABLE: an append commit's manifest lists the
  parent's files plus the new ones; readers of version N hold a fixed
  file list and are unaffected by later commits (no directory-listing
  races — the manifest, not the filesystem, defines the table).
- single-writer contract, same as staging.py: two concurrent
  committers can race on the next version number. At cluster scale
  the publish step becomes a conditional put / rename-if-absent on
  the object store, which is exactly where Delta/Iceberg hook in.

Manifests are tiny (one JSON entry per file), so every metadata
operation here is O(#files) driver work with no Spark job; only
read/write move data, and reads hand Spark an explicit file list so
partition pruning and row-group skipping work as on any parquet scan.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"


def _manifest_dir(table: Path) -> Path:
    return table / _MANIFEST_DIR


def _data_dir(table: Path) -> Path:
    return table / _DATA_DIR


def _manifest_path(table: Path, version: int) -> Path:
    return _manifest_dir(table) / f"v{version:05d}.json"


def _batch_marker_path(table: Path) -> Path:
    # Retained batch_id ledger (batch_id → version). Manifests are the
    # primary idempotency record, but vacuum deletes expired manifests
    # — without this file a foreachBatch replay of a batch OLDER than
    # the retention window would re-commit and silently duplicate
    # table contents. Vacuum folds expired manifests' batch_ids in
    # here BEFORE deleting them and never drops the file.
    return _manifest_dir(table) / "_batch_ids.json"


def _read_batch_markers(table: Path) -> dict:
    p = _batch_marker_path(table)
    if p.exists():
        with open(p) as f:
            return json.load(f)
    return {}


def snapshot_versions(table_path: str) -> list[int]:
    """All committed versions, ascending. Empty for a fresh path."""
    mdir = _manifest_dir(Path(table_path))
    if not mdir.exists():
        return []
    out = []
    for p in mdir.glob("v*.json"):
        try:
            out.append(int(p.stem[1:]))
        except ValueError:
            continue
    return sorted(out)


def _read_manifest(table: Path, version: int) -> dict:
    with open(_manifest_path(table, version)) as f:
        return json.load(f)


def snapshot_manifest(table_path: str, version: int | None = None) -> dict:
    """The manifest dict of `version` (default: latest). Keys:
    version, parent, mode, files [{path, rows}], total_rows."""
    table = Path(table_path)
    versions = snapshot_versions(table_path)
    if not versions:
        raise FileNotFoundError(f"no snapshots at {table_path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise FileNotFoundError(
            f"version {v} not in {versions} at {table_path}"
        )
    return _read_manifest(table, v)


def snapshot_write(
    df: DataFrame,
    table_path: str,
    mode: str = "append",
    batch_id: int | str | None = None,
    partition_by: list[str] | None = None,
) -> int:
    """Commit `df` as a new snapshot; returns the new version.

    mode="append" keeps the parent version's files; "overwrite"
    starts the file list fresh (parent files stay on disk, readable
    via time travel, until vacuum). The commit is atomic at the
    manifest-publish step.

    `batch_id` makes the commit idempotent for at-least-once
    replayers (foreachBatch): if any manifest already records this
    batch_id, the write is a no-op returning that version. Combined
    with the atomic publish this gives exactly-once table contents —
    a replay after a crash BEFORE publish rewrites the same data
    files and publishes once; a replay after publish is skipped. The
    id is only meaningful within one checkpoint lineage (same
    contract as streaming/admission.py's markers).

    `partition_by` hive-partitions the data files (data/col=val/...);
    snapshot_read reconstructs the partition columns via basePath and
    filters on them prune at file-listing time — the 100 TB layout
    lever. Append commits must keep the parent's partitioning
    (changing it silently would poison pruning); overwrite may change
    it.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode}")
    partition_by = list(partition_by) if partition_by else []
    table = Path(table_path)
    _manifest_dir(table).mkdir(parents=True, exist_ok=True)
    _data_dir(table).mkdir(parents=True, exist_ok=True)

    versions = snapshot_versions(table_path)
    if batch_id is not None:
        for v in versions:
            m = _read_manifest(table, v)
            if m.get("batch_id") == str(batch_id):
                return v
        # batch committed in a version vacuum has since expired: the
        # retained ledger still remembers it — replay stays a no-op
        # even past the retention window (the returned version may no
        # longer be readable; only the idempotency contract matters).
        marker = _read_batch_markers(table).get(str(batch_id))
        if marker is not None:
            return marker
    parent = versions[-1] if versions else None
    new_version = (parent or 0) + 1
    if mode == "append" and parent is not None:
        parent_parts = _read_manifest(table, parent).get("partition_by", [])
        if partition_by != parent_parts:
            raise ValueError(
                f"append with partition_by={partition_by} onto a table "
                f"partitioned by {parent_parts}; match the parent or "
                "overwrite"
            )

    # 1. write data files into a scratch dir (unique name: a crashed
    #    commit's scratch can never collide with a later retry)
    scratch = table / f"_scratch-{uuid.uuid4().hex}"
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(str(scratch))
    produced = sorted(
        p for p in scratch.rglob("part-*.parquet") if p.is_file()
    )

    # 2. move them under the data dir with version-prefixed names,
    #    preserving partition subdirs — no manifest references these
    #    yet, so a crash here only strands orphans (vacuum's job).
    #    Row counts come from the parquet footers — no Spark job.
    import pyarrow.parquet as pq

    files = []
    for i, src in enumerate(produced):
        rel_dir = src.parent.relative_to(scratch)
        name = f"v{new_version:05d}-{i:03d}.parquet"
        dst_dir = _data_dir(table) / rel_dir
        dst_dir.mkdir(parents=True, exist_ok=True)
        dst = dst_dir / name
        shutil.move(str(src), str(dst))
        rel = (
            f"{_DATA_DIR}/{rel_dir}/{name}"
            if str(rel_dir) != "."
            else f"{_DATA_DIR}/{name}"
        )
        files.append(
            {
                "path": rel,
                "rows": pq.ParquetFile(dst).metadata.num_rows,
            }
        )
    shutil.rmtree(scratch)

    if mode == "append" and parent is not None:
        files = _read_manifest(table, parent)["files"] + files

    # 3. publish: temp write + atomic rename — the ONLY step that
    #    changes what readers see
    manifest = {
        "version": new_version,
        "parent": parent,
        "mode": mode,
        "files": files,
        "total_rows": sum(f["rows"] for f in files),
    }
    if partition_by:
        manifest["partition_by"] = partition_by
    if batch_id is not None:
        manifest["batch_id"] = str(batch_id)
    tmp = _manifest_dir(table) / f"_tmp-{uuid.uuid4().hex}.json"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _manifest_path(table, new_version))
    return new_version


def snapshot_read(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """DataFrame over a pinned snapshot (default: latest).

    The file list is fixed at call time — later commits/compactions
    never change what this DataFrame reads (data files are immutable
    and vacuum refuses to break un-vacuumed versions).
    """
    m = snapshot_manifest(table_path, version)
    table = Path(table_path)
    if not m["files"]:
        # empty snapshot — preserve an empty-but-typed scan by reading
        # the parent version's schema if any file ever existed
        raise ValueError(
            f"version {m['version']} of {table_path} lists no files"
        )
    reader = spark.read
    if m.get("partition_by"):
        # basePath reconstructs the hive partition columns from the
        # dir names; filters on them prune at file-listing time
        reader = reader.option("basePath", str(table / _DATA_DIR))
    return reader.parquet(*[str(table / f["path"]) for f in m["files"]])


def snapshot_changes(
    spark: SparkSession,
    table_path: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """Rows in files ADDED after `from_version` up to `to_version`
    (default latest) — incremental reads from file-level lineage.

    For append-only commits this is exactly the new data, so a
    downstream job processes only the delta instead of rescanning the
    table (the 100 TB incremental-ETL contract; same idea as Delta's
    CDF restricted to appends). If any commit in the range rewrote
    files (overwrite/rollback/compact), added files don't mean added
    rows — that range raises instead of silently double-counting.
    """
    table = Path(table_path)
    versions = snapshot_versions(table_path)
    to_v = versions[-1] if to_version is None else to_version
    # from_version=0 means "since before the first commit" — the same
    # convention the streaming source's startingVersion uses.
    for v in (from_version, to_v):
        if v != 0 and v not in versions:
            raise FileNotFoundError(
                f"version {v} not in {versions} at {table_path}"
            )
    if to_v < from_version:
        raise ValueError(f"to_version {to_v} < from_version {from_version}")
    for v in versions:
        if from_version < v <= to_v:
            m = _read_manifest(table, v)
            mode = m["mode"]
            # A parent-less commit (first version, even if written
            # with mode='overwrite') rewrote nothing — every file it
            # lists is added data, so it is append-equivalent here.
            if mode != "append" and m.get("parent") is not None:
                raise ValueError(
                    f"version {v} is mode={mode}; snapshot_changes only "
                    "supports append-only ranges (read the snapshots and "
                    "diff by key instead)"
                )
    base = (
        {f["path"] for f in _read_manifest(table, from_version)["files"]}
        if from_version != 0
        else set()
    )
    added = [
        f["path"]
        for f in _read_manifest(table, to_v)["files"]
        if f["path"] not in base
    ]
    if not added:
        # empty-but-typed frame with the table's schema
        return snapshot_read(spark, table_path, to_v).limit(0)
    return spark.read.parquet(*[str(table / p) for p in added])


def snapshot_rollback(table_path: str, version: int) -> int:
    """Publish a NEW version with `version`'s exact file list.

    Roll-forward-style rollback (as in Delta RESTORE): history is
    preserved, nothing is deleted, and the rollback itself is one
    atomic manifest publish.
    """
    table = Path(table_path)
    m = snapshot_manifest(table_path, version)
    new_version = snapshot_versions(table_path)[-1] + 1
    manifest = {
        "version": new_version,
        "parent": m["version"],
        "mode": "rollback",
        "files": m["files"],
        "total_rows": m["total_rows"],
    }
    tmp = _manifest_dir(table) / f"_tmp-{uuid.uuid4().hex}.json"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _manifest_path(table, new_version))
    return new_version


def snapshot_compact(
    spark: SparkSession, table_path: str, target_files: int = 1
) -> int:
    """Rewrite the latest snapshot into `target_files` files as a new
    version (mode=overwrite). Time travel to pre-compaction versions
    still works — their files are untouched until vacuum."""
    m = snapshot_manifest(table_path)
    df = snapshot_read(spark, table_path).coalesce(target_files)
    return snapshot_write(
        df,
        table_path,
        mode="overwrite",
        partition_by=m.get("partition_by"),
    )


def snapshot_vacuum(table_path: str, keep_last: int = 1) -> dict:
    """Drop all but the newest `keep_last` versions and delete data
    files no kept version references (plus orphans from crashed
    commits).

    Deletion order is crash-safe: expired manifests go first (so no
    readable version can ever reference a missing file), then
    unreferenced data files, then leftover scratch dirs. A crash
    mid-vacuum leaves only extra files, never a broken version.
    """
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    table = Path(table_path)
    versions = snapshot_versions(table_path)
    kept, expired = versions[-keep_last:], versions[:-keep_last]

    # Fold expiring batch_ids into the retained ledger FIRST, fsync,
    # then delete manifests — a crash in between leaves both records
    # (harmless); the reverse order could lose the idempotency marker.
    markers = _read_batch_markers(table)
    dirty = False
    for v in expired:
        m = _read_manifest(table, v)
        bid = m.get("batch_id")
        if bid is not None and bid not in markers:
            markers[bid] = v
            dirty = True
    if dirty:
        tmp = _manifest_dir(table) / f"_tmp-{uuid.uuid4().hex}.json"
        with open(tmp, "w") as f:
            json.dump(markers, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, _batch_marker_path(table))

    for v in expired:
        os.remove(_manifest_path(table, v))

    referenced = set()
    for v in kept:
        referenced.update(f["path"] for f in _read_manifest(table, v)["files"])
    removed = []
    for p in sorted(_data_dir(table).rglob("*.parquet")):
        rel = f"{_DATA_DIR}/{p.relative_to(_data_dir(table))}"
        if rel not in referenced:
            os.remove(p)
            removed.append(rel)
    # empty partition dirs left behind by removals
    for d in sorted(
        (p for p in _data_dir(table).rglob("*") if p.is_dir()),
        key=lambda p: len(p.parts),
        reverse=True,
    ):
        if not any(d.iterdir()):
            d.rmdir()
    for scratch in table.glob("_scratch-*"):
        shutil.rmtree(scratch)
    return {
        "kept_versions": kept,
        "expired_versions": expired,
        "removed_files": removed,
    }
