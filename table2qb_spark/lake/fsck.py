"""cdc-fsck — metadata/data integrity checker for the lake format.

At 10^10 events the table's correctness rests on invariants no single
operation re-verifies end-to-end: every snapshot header must resolve to
manifests that exist and parse, every referenced data/delete file must
exist, per-bucket pointer ``rows`` must equal the live-row arithmetic the
commit recorded (data rows minus equality-delete masks), the exactly-once
marker set must cover the retained history (modulo the one crash-window
marker ``has_commit`` heals), schema versions must keep column ids unique
and key columns present, and nothing on disk should be referenced by
nothing (orphans from losing commit attempts — expected, bounded, and
reclaimable by expire, but worth counting).

``fsck(table)`` walks all of that metadata driver-side — header + manifest
I/O is O(snapshots + touched buckets), the same order every commit already
pays. ``deep=True`` additionally opens every referenced parquet FOOTER and
compares physical row counts against the manifest — run DISTRIBUTED via
``mapInPandas`` over the path list (one Arrow batch of paths per task, a
pyarrow metadata read each — no row data ever loads), so the deep pass
scales with executor count, not driver time.

Read-only by design: fsck never repairs (repair actions live with their
owners: expire cleans orphans, has_commit heals the marker window, rollback
rewinds bad commits). Exit contract: ``ok`` is False only for invariant
VIOLATIONS; expected debris (orphans, staged snapshots) are warnings.

The reference engine has no persistent state at all (single-pass CSV
converter — SURVEY.md); this is north-rule operational surface.
"""

from __future__ import annotations

import glob
import json
import os

from table2qb_spark.lake.table import COMMITS_DIR, META_DIR, LakeTable


def _list_headers(table: LakeTable) -> list[dict]:
    out = []
    for p in sorted(glob.glob(os.path.join(table.path, META_DIR, "v*.json"))):
        try:
            with open(p) as f:
                out.append(json.load(f))
        except (OSError, json.JSONDecodeError) as e:
            out.append({"__broken__": f"{os.path.basename(p)}: {e}"})
    return out


def fsck(table: LakeTable, deep: bool = False) -> dict:
    """Verify the table's structural invariants; see module docstring.
    Returns {"ok", "errors", "warnings", "checked": {...counts}}."""
    errors: list[str] = []
    warnings: list[str] = []
    counts = {
        "snapshots": 0,
        "staged": 0,
        "manifests": 0,
        "data_files": 0,
        "delete_files": 0,
        "pos_delete_files": 0,
        "markers": 0,
        "orphan_data_files": 0,
        "deep_verified_files": 0,
    }

    headers = _list_headers(table)
    for h in headers:
        if "__broken__" in h:
            errors.append(f"unreadable snapshot header: {h['__broken__']}")
    headers = [h for h in headers if "__broken__" not in h]
    counts["snapshots"] = len(headers)
    by_id = {h["snapshot_id"]: h for h in headers}

    cur_id = table.current_snapshot_id()
    if cur_id not in by_id:
        errors.append(f"VERSION points at missing snapshot {cur_id}")

    markers_dir = os.path.join(table.path, META_DIR, COMMITS_DIR)
    markers = set(os.listdir(markers_dir)) if os.path.isdir(markers_dir) else set()
    counts["markers"] = len(markers)

    referenced: set[str] = set()  # manifest + data relpaths any header uses
    for h in headers:
        sid = h["snapshot_id"]
        staged = bool(h.get("staged"))
        if staged:
            counts["staged"] += 1
            warnings.append(f"snapshot {sid} is staged (write-audit-publish)")
        # parent chain: a missing parent is normal after expiry, but a parent
        # NEWER than the child is impossible under monotonic ids
        parent = h.get("parent_id")
        if parent is not None and parent >= sid:
            errors.append(f"snapshot {sid} has non-ancestor parent {parent}")
        # exactly-once: every retained PUBLISHED snapshot's commit should
        # have a marker; the current head may legitimately lack one for the
        # crash window has_commit() heals; staged snapshots mark at publish
        cid = h.get("commit_id")
        if cid and not staged and cid not in markers and sid != cur_id:
            if cid != "__create__" and not (
                h.get("applied_commits")  # legacy inline-marker format
            ):
                warnings.append(
                    f"snapshot {sid}: commit {cid} has no marker "
                    "(healed on next has_commit/commit)"
                )
        # schema invariants per version
        for v, cols in h.get("schemas", {}).items():
            ids = [c["id"] for c in cols]
            if len(ids) != len(set(ids)):
                errors.append(f"snapshot {sid} schema v{v}: duplicate column ids")
            names = {c["name"] for c in cols}
            for k in h.get("key_columns", []):
                if k not in names:
                    errors.append(
                        f"snapshot {sid} schema v{v}: key column {k} missing"
                    )
        # manifests + file references
        man_rel = h.get("manifest")
        if not man_rel:
            continue  # legacy inline-files header: nothing more to resolve
        referenced.add(man_rel)
        man_path = os.path.join(table.path, man_rel)
        if not os.path.exists(man_path):
            errors.append(f"snapshot {sid}: manifest list {man_rel} missing")
            continue
        with open(man_path) as f:
            mlist = json.load(f)
        for b, ptr in (mlist.get("buckets") or {}).items():
            counts["manifests"] += 1
            referenced.add(ptr["path"])
            bm_path = os.path.join(table.path, ptr["path"])
            if not os.path.exists(bm_path):
                errors.append(
                    f"snapshot {sid} bucket {b}: manifest {ptr['path']} missing"
                )
                continue
            with open(bm_path) as f:
                doc = json.load(f)
            data_rows = 0
            del_rows = 0
            for e in doc.get("files", []):
                counts["data_files"] += 1
                referenced.add(e["path"])
                data_rows += int(e.get("rows", 0))
                if not os.path.exists(os.path.join(table.path, e["path"])):
                    errors.append(
                        f"snapshot {sid} bucket {b}: data file {e['path']} missing"
                    )
            for e in doc.get("delete_files", []):
                counts["delete_files"] += 1
                referenced.add(e["path"])
                del_rows += int(e.get("rows", 0))
                if not os.path.exists(os.path.join(table.path, e["path"])):
                    errors.append(
                        f"snapshot {sid} bucket {b}: delete file {e['path']} missing"
                    )
            for e in doc.get("pos_delete_files", []):
                counts["pos_delete_files"] += 1
                referenced.add(e["path"])
                del_rows += int(e.get("rows", 0))
                if not os.path.exists(os.path.join(table.path, e["path"])):
                    errors.append(
                        f"snapshot {sid} bucket {b}: position-delete file "
                        f"{e['path']} missing"
                    )
            # pointer rows = LIVE rows = data rows minus the delete masks
            # (each equality- or position-delete entry masks exactly one
            # then-live copy)
            live = data_rows - del_rows
            if int(ptr.get("rows", -1)) != live:
                errors.append(
                    f"snapshot {sid} bucket {b}: pointer rows {ptr.get('rows')} "
                    f"!= live rows {live} ({data_rows} data - {del_rows} deletes)"
                )

    # orphans: on-disk data files no retained header references — losing
    # commit attempts and expired-but-uncollected files; expire reclaims them
    data_root = os.path.join(table.path, "data")
    on_disk = set()
    for dirpath, _dirs, files in os.walk(data_root):
        for fn in files:
            if fn.endswith(".parquet"):
                on_disk.add(os.path.relpath(os.path.join(dirpath, fn), table.path))
    orphans = on_disk - referenced
    counts["orphan_data_files"] = len(orphans)
    if orphans:
        warnings.append(
            f"{len(orphans)} orphan data file(s) on disk (unreferenced by any "
            "retained snapshot; cdc-expire reclaims them)"
        )

    if deep:
        # physical row counts vs manifest: footer-only reads, DISTRIBUTED —
        # one Arrow batch of paths per task, no row data loaded
        import pandas as pd

        snap = table.snapshot()
        expected: list[tuple[str, int]] = []
        for b in snap.files:
            for e in snap.files[b]:
                expected.append((e["path"], int(e.get("rows", 0))))
            for e in snap.delete_files(b):
                expected.append((e["path"], int(e.get("rows", 0))))
            for e in snap.pos_delete_files(b):
                expected.append((e["path"], int(e.get("rows", 0))))
        root = table.path

        def _footer_rows(batches):
            import pyarrow.parquet as pq

            for pdf in batches:
                got = []
                for rel in pdf["path"]:
                    try:
                        got.append(
                            pq.ParquetFile(os.path.join(root, rel)).metadata.num_rows
                        )
                    except Exception:
                        got.append(-1)
                yield pd.DataFrame({"path": pdf["path"], "physical_rows": got})

        if expected:
            pdf = table.spark.createDataFrame(
                [(p,) for p, _ in expected], "path string"
            ).repartition(max(1, min(len(expected), 64)))
            phys = {
                r["path"]: r["physical_rows"]
                for r in pdf.mapInPandas(
                    _footer_rows, "path string, physical_rows long"
                ).collect()
            }
            for rel, want in expected:
                counts["deep_verified_files"] += 1
                got = phys.get(rel)
                if got != want:
                    errors.append(
                        f"file {rel}: manifest rows {want} != physical rows {got}"
                    )

    return {
        "ok": not errors,
        "errors": errors,
        "warnings": warnings,
        "checked": counts,
    }
