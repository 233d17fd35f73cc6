"""Bucket-count evolution — re-hash the whole table into a new bucket count.

``n_buckets`` is the unit of merge parallelism and bucket pruning: a table
initialized at 64 buckets cannot absorb 100 TB of growth (one bucket's data
must fit an executor), and a table over-bucketed at birth pays per-bucket
metadata forever. Iceberg solves this with partition-spec evolution; this
format's analog is a one-time full rewrite under the new layout:

- the rewrite is ONE distributed pass: masked ``read()`` (so merge-on-read
  delete debt folds away for free, like compaction) -> new ``__bucket``
  hash -> bucket-partitioned write. No driver-side row ever materializes.
- the commit replaces EVERY bucket manifest and re-declares ``n_buckets``
  in the new snapshot header. Historical snapshots keep their own count in
  their headers, so TIME TRAVEL still routes reads/pruning through the
  layout that wrote them — no migration of history.
- idempotent (``rebucket-<snapshot>-<n>`` commit id) and concurrency-safe
  (``base_snapshot_id``: a merge landing mid-rewrite fails the commit
  instead of being silently dropped).

Cost model at scale: identical to a full compaction (read + write the live
bytes once); run it like compaction — off-peak, and only when the layout no
longer matches the data size. Subsequent merges route by the new count
automatically (they read ``snap.n_buckets``).

Reference analog: none (table2qb has no lake layer) — north-rule surface,
same family as lake/compact.py.
"""

from __future__ import annotations

import time

from table2qb_spark.lake.table import LakeTable, key_bucket_expr


def rebucket(
    table: LakeTable,
    n_buckets: int,
    sort_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> dict:
    """Rewrite the table into ``n_buckets`` hash buckets. Returns
    {skipped, commit_id, n_buckets_before/after, files_before/after}.
    ``sort_by``/``max_records_per_file`` cluster within the new buckets
    during the same pass (one rewrite, both layouts improved)."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    t0 = time.time()
    snap = table.snapshot()
    if n_buckets == snap.n_buckets:
        return {"skipped": True, "reason": f"already {n_buckets} buckets"}
    commit_id = f"rebucket-{snap.snapshot_id}-{n_buckets}"
    if table.has_commit(commit_id):
        return {"skipped": True, "commit_id": commit_id}
    if sort_by:
        known = {c["name"] for c in snap.current_schema()}
        bad = [c for c in sort_by if c not in known]
        if bad:
            raise ValueError(
                f"sort_by columns not in table schema: {bad} "
                f"(available: {sorted(known)})"
            )

    df = table.read()  # masked full state: MOR debt folds away in the rewrite
    df = df.withColumn("__bucket", key_bucket_expr(snap.key_columns, n_buckets))
    new_files = table.write_data_files(
        df,
        snapshot_hint=f"rb{snap.snapshot_id + 1:07d}",
        sort_by=sort_by,
        max_records_per_file=max_records_per_file,
        n_partitions=n_buckets,
    )
    replaced = [int(b) for b in snap.files]
    files_before = sum(len(snap.files[b]) for b in snap.files)
    table.commit_files(
        commit_id,
        replaced,
        new_files,
        {"rebucketed_to": n_buckets},
        base_snapshot_id=snap.snapshot_id,
        n_buckets=n_buckets,
    )
    return {
        "skipped": False,
        "commit_id": commit_id,
        "n_buckets_before": snap.n_buckets,
        "n_buckets_after": n_buckets,
        "files_before": files_before,
        "files_after": sum(len(v) for v in new_files.values()),
        "seconds": time.time() - t0,
    }
