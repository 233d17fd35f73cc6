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
    sort_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    zorder: list[str] | None = None,
    zorder_bits: int = 8,
    min_delete_ratio: float | None = None,
) -> dict:
    """Rewrite buckets with >= min_files files (or all listed buckets).
    Returns {compacted_buckets, files_before, files_after, skipped}.

    ``sort_by`` produces a SORTED rewrite (Iceberg's sorted compaction):
    rows are clustered by the given columns within each bucket, so the
    rewritten files' manifest min/max stats become tight — and with
    ``max_records_per_file`` each bucket splits into several files with
    disjoint ``sort_by`` ranges, letting ``read(where=...)`` prune at file
    granularity inside a bucket (see lake/skipping.py). The sort is
    per-task (sortWithinPartitions under the existing bucket exchange), no
    extra shuffle; a bucket whose rows exceed task memory spills, it never
    becomes one global sort. Pick sort columns to match the dominant read
    predicates (e.g. ``_seq`` for incremental tails, a repo/path prefix for
    point lookups). A compact with sort_by always rewrites the listed
    buckets (min_files is ignored for selection only when a sort or purge
    was requested — a single unsorted file still benefits from the
    rewrite).

    ``zorder`` produces a Z-ORDERED rewrite instead (lake/zorder.py —
    Delta's OPTIMIZE ZORDER BY analog): rows cluster along a Morton curve
    over the given columns' quantile ranks, so ``read(where=...)`` prunes
    files on predicates over ANY z-ordered column, not just a leading sort
    column. Costs one extra narrow aggregate pass (the quantile fit over
    only those columns) on top of the rewrite the compaction pays anyway;
    mutually exclusive with ``sort_by`` (a rewrite has one physical
    order).

    ``min_delete_ratio`` switches selection to MERGE-ON-READ DEBT TARGETING
    (Iceberg's delete-file-threshold rewrite strategy): only buckets whose
    equality-delete rows / physical data rows >= the ratio are rewritten.
    Selection is METADATA-ONLY — both counts come from the bucket manifests,
    no file is opened — so at 100 TB the decision costs one manifest walk
    and the rewrite touches exactly the buckets where update-heavy streams
    concentrated their debt (the hot-key buckets), not the whole table.
    Overrides min_files; composes with an explicit ``buckets`` list (
    intersection) and with sort_by/zorder (the targeted rewrite clusters
    while it folds the debt away)."""
    snap = table.snapshot()
    if sort_by and zorder:
        raise ValueError(
            "sort_by and zorder are mutually exclusive: one rewrite has one "
            "physical row order (use zorder alone for multi-column skipping)"
        )
    if sort_by or zorder:
        known = {c["name"] for c in snap.current_schema()}
        bad = [c for c in (sort_by or zorder) if c not in known]
        if bad:
            raise ValueError(
                f"{'sort_by' if sort_by else 'zorder'} columns not in table "
                f"schema: {bad} (available: {sorted(known)})"
            )
    commit_id = f"compact-{snap.snapshot_id}"
    if table.has_commit(commit_id):
        return {"skipped": True, "commit_id": commit_id}

    candidates = []
    deletes_cleared_files = deletes_cleared_rows = 0
    for b, entries in snap.files.items():
        bi = int(b)
        if buckets is not None and bi not in buckets:
            continue
        if min_delete_ratio is not None:
            # MOR debt targeting: manifest-stat counts only, no file opened
            # — both delete flavors count (equality: lake/mor.py; position:
            # lake/dml.py predicate DELETE)
            del_entries = snap.delete_files(bi) + snap.pos_delete_files(bi)
            del_rows = sum(int(e.get("rows", 0) or 0) for e in del_entries)
            data_rows = sum(int(e.get("rows", 0) or 0) for e in entries)
            if del_rows and del_rows >= min_delete_ratio * max(data_rows, 1):
                candidates.append(bi)
                deletes_cleared_files += len(del_entries)
                deletes_cleared_rows += del_rows
            continue
        if (
            len(entries) >= min_files
            or purge_below_seq is not None
            or sort_by is not None
            or zorder is not None
        ):
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

    effective_sort = sort_by
    if zorder:
        from table2qb_spark.lake.zorder import zorder_value

        df = df.withColumn("__z", zorder_value(df, zorder, zorder_bits))
        effective_sort = ["__z"]  # ephemeral: dropped after the sort

    new_files = table.write_data_files(
        df,
        snapshot_hint=f"c{snap.snapshot_id + 1:07d}",
        sort_by=effective_sort,
        max_records_per_file=max_records_per_file,
    )
    for b in candidates:
        new_files.setdefault(b, [])
    files_before = sum(len(snap.files.get(str(b), [])) for b in candidates)
    files_after = sum(len(v) for v in new_files.values())
    summary: dict = {"compacted": candidates}
    if sort_by:
        summary["sort_by"] = list(sort_by)
    if zorder:
        summary["zorder"] = list(zorder)
    if min_delete_ratio is not None:
        summary["min_delete_ratio"] = min_delete_ratio
    table.commit_files(
        commit_id,
        candidates,
        new_files,
        summary,
        base_snapshot_id=snap.snapshot_id,
    )
    out = {
        "skipped": False,
        "commit_id": commit_id,
        "compacted_buckets": len(candidates),
        "files_before": files_before,
        "files_after": files_after,
    }
    if min_delete_ratio is not None:
        out["deletes_cleared_files"] = deletes_cleared_files
        out["deletes_cleared_rows"] = deletes_cleared_rows
    return out
