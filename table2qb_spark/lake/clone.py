"""Zero-copy shallow clone (``cdc-clone``): a new, independently writable
table whose first snapshot REFERENCES the source's data files in place —
Delta Lake's ``SHALLOW CLONE`` / Iceberg snapshot-export re-expressed for
this lake format.

Why it matters at 100 TB: "give me a writable copy of the corpus as of
tag X" must not mean copying 100 TB. A clone is O(metadata): the source
snapshot's per-bucket manifests are rewritten into the clone's ``_meta/``
with every data-file path made ABSOLUTE into the source tree (the read
path joins ``table.path`` with entry paths via ``os.path.join``, which
passes absolute paths through untouched — so reads, stats/bloom skipping,
MOR masks and schema mapping all work unchanged). File stats and bloom
filters live INLINE in the manifest entries, so data skipping survives the
clone for free.

Divergence is plain copy-on-write: the first merge/DML/compact on the
clone rewrites touched buckets into the clone's own ``data/`` directory;
untouched buckets keep pointing into the source. The clone starts a fresh
exactly-once domain (no commit markers are copied), so replaying the
source's change log into the clone RE-APPLIES — that is the point of a
fork.

Ownership rule (the safety invariant): **a table never deletes a file
outside its own root.** ``expire_snapshots`` and the orphan sweep skip
absolute (external) entry paths — they are the source's property. The
inverse hazard is inherited from Delta/Iceberg shallow clones and
documented rather than prevented: expiring/compacting the SOURCE can
delete files a clone still references (the source doesn't know its
clones). Clone from a TAG and keep the tag alive for the clone's
lifetime — tags pin snapshots against expiry (lake/expire.py).

Reference analog: none (table2qb has no lake layer; SURVEY.md §1) —
north-rule surface, Delta ``SHALLOW CLONE`` semantics.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import SparkSession

from table2qb_spark.lake.table import (
    COMMITS_DIR,
    DATA_DIR,
    META_DIR,
    LakeTable,
    Snapshot,
)


def _absolutize(src_root: str, entries: list[dict]) -> list[dict]:
    return [
        {**e, "path": e["path"] if os.path.isabs(e["path"])
         else os.path.join(src_root, e["path"])}
        for e in entries
    ]


def clone_table(
    spark: SparkSession,
    source_path: str,
    dest_path: str,
    snapshot_ref: "int | str | None" = None,
) -> dict:
    """Create ``dest_path`` as a shallow clone of ``source_path`` at
    ``snapshot_ref`` (id or tag; default current). O(metadata) — no data
    files are read or copied; returns a summary dict."""
    src = LakeTable(spark, source_path)
    sid = (src.resolve_ref(snapshot_ref) if snapshot_ref is not None
           else src.current_snapshot_id())
    snap = src.snapshot(sid)
    if LakeTable.exists(dest_path):
        raise ValueError(f"destination already exists: {dest_path}")

    dst = LakeTable(spark, dest_path)
    os.makedirs(os.path.join(dst.path, META_DIR, COMMITS_DIR), exist_ok=True)
    os.makedirs(os.path.join(dst.path, DATA_DIR), exist_ok=True)

    # Rewrite each bucket manifest with absolute source paths; stats and
    # bloom filters ride along inline, so file skipping survives the clone.
    token = uuid.uuid4().hex[:8]
    new_files: dict = {}
    new_deletes: dict = {}
    new_pos_deletes: dict = {}
    n_data = 0
    for b in snap.files:
        new_files[b] = _absolutize(src.path, snap.files[b])
        n_data += len(new_files[b])
        dels = snap.delete_files(b)
        if dels:
            new_deletes[b] = _absolutize(src.path, dels)
        pdels = snap.pos_delete_files(b)
        if pdels:
            new_pos_deletes[b] = _absolutize(src.path, pdels)
    pointers = dst._write_bucket_manifests(
        1, new_files, token, new_deletes or None, new_pos_deletes or None
    )

    clone_snap = Snapshot(
        snapshot_id=1,
        parent_id=None,
        commit_id=f"__clone__{token}",
        schema_version=snap.schema_version,
        schemas=snap.schemas,
        key_columns=snap.key_columns,
        n_buckets=snap.n_buckets,
        files={},
        n_commits=1,
        summary={
            **snap.summary,
            "operation": "clone",
            "source": src.path,
            "source_snapshot": sid,
        },
        timestamp_ms=int(time.time() * 1000),
        properties=dict(snap.properties),
    )
    dst._write_snapshot(clone_snap, pointers)
    return {
        "dest": dst.path,
        "source": src.path,
        "source_snapshot": sid,
        "buckets": len(pointers),
        "referenced_data_files": n_data,
        "rows": snap.summary.get("row_count"),
    }
