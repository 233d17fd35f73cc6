"""MERGE upsert into a LakeTable — the CDC apply primitive.

Semantics (north rule): key-partitioned MERGE on the table's key columns with
insert/update/delete ops —

    MERGE INTO t USING batch ON t.key = batch.key
      WHEN MATCHED AND batch.op = 'D' THEN DELETE
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED AND batch.op != 'D' THEN INSERT *

Two physical strategies, chosen by batch-vs-table size:

**Pruned path** (steady-state CDC: batch small relative to table):
1. dedup the batch max-seq-wins per key (map-side combining hash agg),
   persist it (it feeds two jobs);
2. collect the *distinct affected buckets* (<= n_buckets rows) — the
   partition-pruning step;
3. read ONLY those buckets' files; full-outer join on the key; apply op
   rules; rewrite only the affected buckets.

**Single-pass path** (bursts/backfills: batch comparable to table): skip the
pruning pre-pass entirely — dedup -> join against the full table -> write,
all in ONE Spark action. Batch statistics (events, deletes, max seq) ride
along via ``pyspark.sql.Observation`` on the deduped subtree: zero extra
passes, no persist. The batch scan happens exactly once.

In both paths the join is key-hash shuffled on both sides (AQE skew-join
splits residual hot keys) and the result is repartitioned by bucket so each
bucket writes one file. At 100 TB the pruned path is the default: cost per
batch is proportional to the touched-bucket data, not the table size.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from table2qb_spark.cdc.dedup import dedup_max_seq
from table2qb_spark.lake.table import LakeTable, key_bucket_expr

# Batches larger than this fraction of the table's rows skip the pruning
# pre-pass (they would touch ~every bucket anyway).
PRUNE_THRESHOLD = 0.2


def merge_upsert(
    table: LakeTable,
    batch_df: DataFrame,
    commit_id: str,
    op_col: str = "op",
    seq_col: str = "seq",
    delete_op: str = "D",
    two_phase_dedup: bool = False,
    summary_update: dict | None = None,
    batch_size_hint: int | None = None,
    force_stats_pass: bool = False,
) -> dict:
    """Apply one change batch. Returns merge stats. Idempotent: a commit_id
    already present in the snapshot history is skipped outright.

    ``batch_size_hint``: approximate event count of the batch (e.g. the seq
    range width) — used to pick the pruned vs single-pass strategy without
    counting the batch."""
    if table.has_commit(commit_id):
        return {"skipped": True, "commit_id": commit_id}

    t0 = time.time()
    snap = table.snapshot()
    keys = snap.key_columns
    data_cols = [c["name"] for c in snap.current_schema()]
    extra_cols = [op_col, seq_col]

    # seq-guarded merge: if the table carries a ``_seq`` provenance column,
    # an incoming row only wins when its seq >= the stored row's seq — makes
    # out-of-order delivery ACROSS batches safe (streaming micro-batches are
    # arrival-ordered, not seq-ordered). Batches never supply ``_seq``; it is
    # derived from the event's seq.
    seq_guard = "_seq" in data_cols
    # tombstones: with a ``_deleted`` column, deletes are recorded logically
    # (row kept, flag set) instead of physically removed — required when
    # batches can arrive out of seq order (a physical delete followed by a
    # late lower-seq update would resurrect the row). Readers filter with
    # LakeTable.read_live(); compaction can purge tombstones below the
    # global applied-seq watermark.
    tombstones = "_deleted" in data_cols

    # 1. dedup: one winner per key
    batch_cols = keys + [
        c for c in data_cols if c not in keys and c not in ("_seq", "_deleted")
    ] + [c for c in extra_cols if c in batch_df.columns and c not in data_cols]
    missing = [c for c in batch_cols if c not in batch_df.columns]
    if missing:
        raise ValueError(f"Batch is missing columns {missing}")
    deduped = dedup_max_seq(
        batch_df.select(*batch_cols), keys, seq_col=seq_col, two_phase=two_phase_dedup
    )
    deduped = deduped.withColumn("__bucket", key_bucket_expr(keys, snap.n_buckets))

    table_rows = int(snap.summary.get("row_count", 0) or 0)
    # force_stats_pass: Observation metrics never fire for actions run inside
    # a streaming foreachBatch, so the streaming path must always take the
    # explicit stats pre-pass.
    use_pruning = force_stats_pass or (
        table_rows > 0
        and batch_size_hint is not None
        and batch_size_hint < PRUNE_THRESHOLD * table_rows
    )

    observation = None
    persisted = False
    if use_pruning:
        # pruned path: one extra (cheap, pruned) pass to find touched buckets
        deduped = deduped.persist()
        persisted = True
        bucket_stats = (
            deduped.groupBy("__bucket")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.when(F.col(op_col) == delete_op, 1).otherwise(0)).alias("dels"),
                F.max(seq_col).alias("max_seq"),
            )
            .collect()
        )
        affected = sorted(r["__bucket"] for r in bucket_stats)
        n_total = sum(int(r["n"]) for r in bucket_stats)
        n_dels = sum(int(r["dels"] or 0) for r in bucket_stats)
        max_seq = max((r["max_seq"] for r in bucket_stats), default=None)
        if not affected:
            deduped.unpersist()
            table.commit_files(commit_id, [], {}, summary_update)
            return {
                "skipped": False,
                "commit_id": commit_id,
                "affected_buckets": 0,
                "upserts": 0,
                "deletes": 0,
                "strategy": "pruned",
                "seconds": time.time() - t0,
            }
        current = table.read(buckets=affected)
    else:
        # single-pass path: stats observed inside the one merge action
        observation = Observation(f"merge-{commit_id}")
        deduped = deduped.observe(
            observation,
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col(op_col) == delete_op, 1).otherwise(0)).alias("dels"),
            F.max(seq_col).alias("max_seq"),
        )
        affected = None  # every bucket is replaced
        current = table.read()

    # 2. full-outer merge, op rules applied per column
    s = deduped.alias("s")
    t = current.alias("t")
    joined = t.join(s, on=keys, how="full_outer")
    s_present = F.col(f"s.{seq_col}").isNotNull()
    if seq_guard:
        s_wins = s_present & (
            F.col("t._seq").isNull() | (F.col(f"s.{seq_col}") >= F.col("t._seq"))
        )
    else:
        s_wins = s_present
    is_delete = s_wins & (F.col(f"s.{op_col}") == delete_op)

    result_cols = []
    for c in data_cols:
        if c in keys:
            result_cols.append(F.col(c).alias(c))
        elif c == "_seq":
            result_cols.append(
                F.when(s_wins, F.col(f"s.{seq_col}")).otherwise(F.col("t._seq")).alias("_seq")
            )
        elif c == "_deleted":
            result_cols.append(
                F.when(s_wins, F.col(f"s.{op_col}") == delete_op)
                .otherwise(F.coalesce(F.col("t._deleted"), F.lit(False)))
                .alias("_deleted")
            )
        else:
            result_cols.append(
                F.when(s_wins, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            )
    if tombstones:
        merged = joined.select(*result_cols)
    else:
        merged = joined.where(~is_delete).select(*result_cols)
    merged = merged.withColumn("__bucket", key_bucket_expr(keys, snap.n_buckets))

    new_files = table.write_data_files(
        merged, snapshot_hint=f"{snap.snapshot_id + 1:08d}"
    )

    if observation is not None:
        got = observation.get
        n_total = int(got["n"] or 0)
        n_dels = int(got["dels"] or 0)
        max_seq = got["max_seq"]
        # full rewrite: every previously-populated bucket is replaced
        affected = sorted(set(new_files) | {int(b) for b in snap.files})
    # buckets that lost all rows still count as replaced (their old files go)
    for b in affected:
        new_files.setdefault(b, [])

    su = dict(summary_update or {})
    su.setdefault("max_seq", max_seq)
    table.commit_files(commit_id, affected, new_files, su)
    if persisted:
        deduped.unpersist()
    return {
        "skipped": False,
        "commit_id": commit_id,
        "affected_buckets": len(affected),
        "upserts": n_total - n_dels,
        "deletes": n_dels,
        "strategy": "pruned" if use_pruning else "single-pass",
        "seconds": time.time() - t0,
    }
