"""Incremental change reader: row-level diff between two snapshots —
the Delta CDF / Iceberg incremental-scan shape for downstream consumers
(rebuild only what changed instead of re-reading the table).

The lake's copy-on-write merges rewrite whole buckets, so the diff is
**bucket-pruned by metadata alone**: a bucket whose per-bucket manifest
pointer (or file-entry list) is identical in both snapshots provably has
identical content and is never read. Only changed buckets are scanned, at
BOTH snapshot versions, and a null-safe full outer join on the key columns
classifies every key:

    present only in `to`          -> insert   (post-image)
    present only in `from`        -> delete   (pre-image)
    present in both, values differ -> update  (post-image)

Both sides of the join are bucket-aligned by construction (same bucket
function), so on a cluster the join co-partitions cleanly; a zero-shuffle
per-bucket variant (coalesce(1) zip per bucket, as in cdc/bucketed.py) is
the next step if diff volume ever dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from table2qb_spark.lake.table import LakeTable


def changed_buckets(table: LakeTable, from_id: int, to_id: int) -> list[int]:
    """Buckets whose file sets differ between the two snapshots — a pure
    metadata compare (manifest pointers when available, else entry lists)."""
    s_from, s_to = table.snapshot(from_id), table.snapshot(to_id)
    pf, pt = s_from.manifest_pointers, s_to.manifest_pointers
    if pf is not None and pt is not None:
        keys = set(pf) | set(pt)
        return sorted(int(b) for b in keys if pf.get(b) != pt.get(b))
    keys = set(s_from.files) | set(s_to.files)
    out = []
    for b in keys:
        ef = s_from.files[b] if b in s_from.files else []
        et = s_to.files[b] if b in s_to.files else []
        if ef != et:
            out.append(int(b))
    return sorted(out)


def _diff_joined(table: LakeTable, from_id: int, to_id: int):
    """The shared diff core: bucket-pruned reads of both snapshot versions,
    null-safe full outer join on keys, presence markers and the value-diff
    predicate. Returns (joined, keys, cols, in_old, in_new, differs)."""
    s_to = table.snapshot(to_id)
    keys = s_to.key_columns
    cols = [c["name"] for c in s_to.current_schema()]
    value_cols = [c for c in cols if c not in keys]

    buckets = changed_buckets(table, from_id, to_id)
    old = table.read(snapshot_id=from_id, buckets=buckets).alias("o")
    new = table.read(snapshot_id=to_id, buckets=buckets).alias("n")
    # schema evolution between the snapshots: align the old side onto the
    # new column set (missing columns read as NULL, like any old file)
    for c in cols:
        if c not in old.columns:
            old = old.withColumn(c, F.lit(None))
    old = old.select(*cols).alias("o")

    # side-presence markers: with NULL-able keys the key columns alone can't
    # distinguish "row missing" from "row whose key is NULL", so each side
    # carries a never-null marker column through the full outer join
    old_m = old.withColumn("__o", F.lit(1)).alias("o")
    new_m = new.select(*cols).withColumn("__n", F.lit(1)).alias("n")
    cond = None
    for k in keys:
        e = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = e if cond is None else (cond & e)
    joined = old_m.join(new_m, cond, "full_outer")
    in_old = F.col("o.__o").isNotNull()
    in_new = F.col("n.__n").isNotNull()

    differs = F.lit(False)
    for c in value_cols:
        differs = differs | ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
    return joined, keys, cols, in_old, in_new, differs


def snapshot_diff(
    table: LakeTable, from_id: int, to_id: int | None = None
) -> DataFrame:
    """DataFrame of (change_type, <table columns>) describing how `to_id`
    (default: current) differs from `from_id`. Keys are compared null-safe
    (NULL key components are real values here)."""
    to_id = to_id if to_id is not None else table.current_snapshot_id()
    joined, keys, cols, in_old, in_new, differs = _diff_joined(
        table, from_id, to_id
    )
    change = (
        F.when(in_new & ~in_old, F.lit("insert"))
        .when(in_old & ~in_new, F.lit("delete"))
        .when(differs, F.lit("update"))
    )
    out_cols = [
        F.coalesce(F.col(f"n.{c}"), F.col(f"o.{c}")).alias(c) if c in keys
        else F.when(in_new, F.col(f"n.{c}")).otherwise(F.col(f"o.{c}")).alias(c)
        for c in cols
    ]
    return (
        joined.select(change.alias("change_type"), *out_cols)
        .where(F.col("change_type").isNotNull())
    )


def snapshot_diff_envelope(
    table: LakeTable, from_id: int, to_id: int | None = None
) -> DataFrame:
    """OUTBOUND CDC: the diff as a Debezium-shaped change envelope — one row
    per changed key with ``op`` ('c' create / 'u' update / 'd' delete), full
    ``before``/``after`` row images as structs (NULL on the side that
    doesn't exist), the key columns flattened for routing/partitioning, and
    source metadata (from/to snapshot ids + the target snapshot's commit
    timestamp). This is what a downstream consumer (cache invalidation,
    search indexer, another lake) subscribes to — the engine is a CDC
    *producer* here, closing the loop with the ingest side (cdc-replay
    consumes exactly this shape).

    Same bucket-pruned, co-partitioned plan as ``snapshot_diff`` — the
    envelope is a pure projection on the shared join."""
    to_id = to_id if to_id is not None else table.current_snapshot_id()
    s_to = table.snapshot(to_id)
    joined, keys, cols, in_old, in_new, differs = _diff_joined(
        table, from_id, to_id
    )
    op = (
        F.when(in_new & ~in_old, F.lit("c"))
        .when(in_old & ~in_new, F.lit("d"))
        .when(differs, F.lit("u"))
    )
    before = F.when(
        in_old, F.struct(*[F.col(f"o.{c}").alias(c) for c in cols])
    )
    after = F.when(
        in_new, F.struct(*[F.col(f"n.{c}").alias(c) for c in cols])
    )
    return joined.select(
        op.alias("op"),
        *[F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in keys],
        before.alias("before"),
        after.alias("after"),
        F.lit(from_id).alias("from_snapshot"),
        F.lit(to_id).alias("to_snapshot"),
        F.lit(s_to.timestamp_ms).alias("ts_ms"),
    ).where(F.col("op").isNotNull())
