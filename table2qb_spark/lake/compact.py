"""Table maintenance: small-file compaction + tombstone purge.

Continuous MERGE commits accumulate one-file-per-bucket generations; at
scale the read amplification comes from file COUNT, not bytes. Compaction
rewrites a bucket's files into one (or size-targeted) file(s) and commits
the swap through the same atomic snapshot path as any merge — readers always
see either the old or the new file set.

Tombstone purge: rows with ``_deleted = true`` whose ``_seq`` is at or below
``purge_below_seq`` (the globally-applied watermark — every replayer has
passed it, so no late event can resurrect the key) are physically dropped
during the rewrite.

Idempotent: compaction commits carry commit ids like ``compact-<snapshot>``;
re-running against the same snapshot is skipped.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from table2qb_spark.lake.table import LakeTable, key_bucket_expr


def compact(
    table: LakeTable,
    buckets: list[int] | None = None,
    purge_below_seq: int | None = None,
    min_files: int = 2,
) -> dict:
    """Rewrite buckets with >= min_files files (or all listed buckets).
    Returns {compacted_buckets, files_before, files_after, skipped}."""
    snap = table.snapshot()
    commit_id = f"compact-{snap.snapshot_id}"
    if table.has_commit(commit_id):
        return {"skipped": True, "commit_id": commit_id}

    candidates = []
    for b, entries in snap.files.items():
        bi = int(b)
        if buckets is not None and bi not in buckets:
            continue
        if len(entries) >= min_files or purge_below_seq is not None:
            candidates.append(bi)
    if not candidates:
        return {"skipped": True, "reason": "nothing to compact"}

    df = table.read(buckets=candidates)
    if purge_below_seq is not None and "_deleted" in df.columns:
        purgeable = (
            F.coalesce(F.col("_deleted"), F.lit(False))
            & (F.coalesce(F.col("_seq"), F.lit(0)) <= purge_below_seq)
        )
        df = df.where(~purgeable)
    df = df.withColumn("__bucket", key_bucket_expr(snap.key_columns, snap.n_buckets))

    new_files = table.write_data_files(df, snapshot_hint=f"c{snap.snapshot_id + 1:07d}")
    for b in candidates:
        new_files.setdefault(b, [])
    files_before = sum(len(snap.files.get(str(b), [])) for b in candidates)
    files_after = sum(len(v) for v in new_files.values())
    table.commit_files(
        commit_id,
        candidates,
        new_files,
        {"compacted": candidates},
        base_snapshot_id=snap.snapshot_id,
    )
    return {
        "skipped": False,
        "commit_id": commit_id,
        "compacted_buckets": len(candidates),
        "files_before": files_before,
        "files_after": files_after,
    }
