"""Snapshot expiry + orphan-file cleanup — Iceberg's ``expire_snapshots``
re-expressed for this lake format (reference has no lake layer; the shape
follows the public Iceberg maintenance contract: retained snapshots stay
fully readable, expired ones lose time travel, and a data/manifest file is
deleted only when NO retained snapshot references it).

Copy-on-write merges never delete files at commit time, so storage grows
with every rewritten bucket generation — unbounded at 100 TB without this.

Safety properties:
- The CURRENT snapshot (plus ``keep_last-1`` ancestors, plus anything newer
  than ``older_than_ms``) is always retained; deletion touches only
  artifacts referenced EXCLUSIVELY by expired snapshots.
- Commit markers (``_meta/commits/``) are never deleted: they are the
  exactly-once ledger — a redelivered historic commit id must keep skipping
  even after its snapshot's files are gone. Markers are O(bytes) each.
- Per-bucket manifests (``mb-*.json``) are shared across snapshots by
  pointer reuse, so retention is computed on the union of retained
  snapshots' pointer lists, not on file age.
- Concurrent writers are safe: a new commit only ever references the
  current snapshot's manifests (retained here by construction), and the
  expiry itself writes nothing — a crash mid-delete leaves harmless
  orphans that the next expiry removes.

Driver-side metadata + file deletes: at cluster scale the deletes fan out
through the executors (one partition per file batch); the retention
computation is identical — it reads only manifest lists, never data.
"""

from __future__ import annotations

import glob
import os
import time

from table2qb_spark.lake.table import DATA_DIR, META_DIR, LakeTable


def _existing_snapshot_ids(table: LakeTable) -> list[int]:
    out = []
    for p in glob.glob(os.path.join(table.path, META_DIR, "v*.json")):
        name = os.path.basename(p)
        try:
            out.append(int(name[1:-5]))
        except ValueError:
            continue
    return sorted(out)


def _referenced_paths(table: LakeTable, snapshot_id: int) -> tuple[set, set]:
    """(data file relpaths, bucket-manifest relpaths) referenced by one
    snapshot — metadata reads only."""
    data: set = set()
    manifests: set = set()
    snap = table.snapshot(snapshot_id)
    if snap.manifest_pointers is not None:
        for ptr in snap.manifest_pointers.values():
            manifests.add(ptr["path"])
    for b in snap.files:
        for e in snap.files[b]:
            data.add(e["path"])
        for e in snap.delete_files(b):
            data.add(e["path"])  # MOR equality-delete files are live data
        for e in snap.pos_delete_files(b):
            data.add(e["path"])  # position-delete files too (lake/dml.py)
    return data, manifests


def _sweep_orphans(table: LakeTable) -> int:
    """Delete data files / manifests referenced by NO existing snapshot
    header — a losing commit racer's attempt-unique output, a reclaimed
    foreign orphan's files, or leftovers of a crashed prior expiry. Only
    files older than the orphan grace age are touched, so an IN-FLIGHT
    commit attempt (files written, header not yet linked) is never swept
    mid-commit."""
    grace = float(
        os.environ.get("SPARK_GRAFT_ORPHAN_GRACE_SEC", LakeTable.ORPHAN_GRACE_SEC)
    )
    keep: set = set()
    keep_dirs: set = set()  # change-feed dirs of live snapshots (lake/cdf.py)
    for sid in _existing_snapshot_ids(table):
        try:
            d, m = _referenced_paths(table, sid)
        except FileNotFoundError:
            continue
        keep |= {os.path.normpath(os.path.join(table.path, rel)) for rel in d | m}
        header = table._read_header(sid)
        rel = header.get("manifest")
        if rel:
            keep.add(os.path.normpath(os.path.join(table.path, rel)))
        cdf_rel = (header.get("summary") or {}).get("cdf_dir")
        if cdf_rel:
            keep_dirs.add(os.path.normpath(os.path.join(table.path, cdf_rel)))
    candidates: list[str] = []
    for root, _dirs, files in os.walk(os.path.join(table.path, DATA_DIR)):
        candidates += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
    # change-feed orphans: feeds written by losing/expired commit attempts.
    # A feed dir referenced by ANY existing header stays whole (cdf_dir is
    # inherited forward in summaries, so even non-capturing descendants
    # keep their ancestor's feed alive until that ancestor expires).
    for root, _dirs, files in os.walk(os.path.join(table.path, "changes")):
        if os.path.normpath(root) in keep_dirs:
            continue
        candidates += [os.path.join(root, f) for f in files]
    candidates += glob.glob(os.path.join(table.path, META_DIR, "mb-*.json"))
    candidates += glob.glob(os.path.join(table.path, META_DIR, "m[0-9]*.json"))
    swept = 0
    now = time.time()
    for full in candidates:
        if os.path.normpath(full) in keep:
            continue
        try:
            if now - os.path.getmtime(full) < grace:
                continue
            os.remove(full)
            swept += 1
        except FileNotFoundError:
            continue
    return swept


def expire_snapshots(
    table: LakeTable,
    keep_last: int = 2,
    older_than_ms: int | None = None,
) -> dict:
    """Expire all snapshots except the most recent ``keep_last`` (always
    including the current one) and any newer than ``older_than_ms``; delete
    every data file and per-bucket manifest no retained snapshot references.
    Returns counts. Time travel to an expired snapshot id raises
    FileNotFoundError afterwards; ``history()`` stops at the oldest retained
    snapshot."""
    current = table.current_snapshot_id()
    ids = _existing_snapshot_ids(table)
    retained = {sid for sid in ids[-max(1, keep_last):]}
    retained.add(current)
    if older_than_ms is not None:
        for sid in ids:
            try:
                if table.snapshot(sid).timestamp_ms >= older_than_ms:
                    retained.add(sid)
            except FileNotFoundError:
                continue
    # tagged snapshots are PINNED regardless of age/count: a named ref
    # (lake/table.py create_tag) must never dangle
    for doc in table.list_tags().values():
        sid = int(doc["snapshot_id"])
        if os.path.exists(table._snapshot_path(sid)):
            retained.add(sid)
    # headers above the current VERSION are in-flight: staged snapshots
    # awaiting their audit (write-audit-publish) or a commit mid-swap —
    # expiry never touches them (abandonment is the grace-reclaim's job)
    for sid in ids:
        if sid > current:
            retained.add(sid)
    expired = [sid for sid in ids if sid not in retained]
    if not expired:
        return {"expired_snapshots": 0, "deleted_data_files": 0,
                "deleted_manifests": 0,
                "swept_orphans": _sweep_orphans(table),
                "retained": sorted(retained)}

    # TWO-PHASE: resolve every snapshot's referenced paths BEFORE deleting
    # anything — expired snapshots share per-bucket manifests through
    # pointer reuse, so deleting one snapshot's manifests first would make a
    # later sibling unreadable and silently leak its exclusive files.
    keep_data: set = set()
    keep_manifests: set = set()
    for sid in retained:
        d, m = _referenced_paths(table, sid)
        keep_data |= d
        keep_manifests |= m
    drop_data: set = set()
    drop_manifests: set = set()
    manifest_lists: list[str] = []
    for sid in expired:
        try:
            d, m = _referenced_paths(table, sid)
        except FileNotFoundError:
            # a PRIOR expiry crashed after deleting this snapshot's
            # manifests but before its header: nothing left to resolve —
            # its exclusively-referenced files are unreferenced orphans now
            # and the sweep below removes them; still drop the header
            d, m = set(), set()
        drop_data |= d
        drop_manifests |= m
        # the manifest LIST file is named in the header (attempt-unique
        # since round 3; fixed m{N}.json before that)
        rel = table._read_header(sid).get("manifest")
        if rel:
            manifest_lists.append(rel)

    deleted_data = deleted_manifests = 0
    for rel in drop_data - keep_data:
        if os.path.isabs(rel):
            # external reference (shallow clone — lake/clone.py): the file
            # lives in the SOURCE table's tree and is its property; a table
            # never deletes outside its own root
            continue
        full = os.path.join(table.path, rel)
        if os.path.exists(full):
            os.remove(full)
            deleted_data += 1
    for rel in drop_manifests - keep_manifests:
        if os.path.isabs(rel):
            continue  # same ownership rule (manifests are local today)
        full = os.path.join(table.path, rel)
        if os.path.exists(full):
            os.remove(full)
            deleted_manifests += 1
    for rel in manifest_lists:
        full = os.path.join(table.path, rel)
        if os.path.exists(full):
            os.remove(full)
    for sid in expired:
        for p in (table._snapshot_path(sid), table._manifest_path(sid)):
            if os.path.exists(p):
                os.remove(p)

    swept = _sweep_orphans(table)

    # drop directories emptied by data-file deletion (snap-*/b=*)
    data_root = os.path.join(table.path, DATA_DIR)
    for root, dirs, files in os.walk(data_root, topdown=False):
        if root != data_root and not dirs and not files:
            os.rmdir(root)

    return {
        "expired_snapshots": len(expired),
        "deleted_data_files": deleted_data,
        "deleted_manifests": deleted_manifests,
        "swept_orphans": swept,
        "retained": sorted(retained),
    }
