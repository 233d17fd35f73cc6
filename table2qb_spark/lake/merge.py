"""MERGE upsert into a LakeTable — the CDC apply primitive.

Semantics (north rule): key-partitioned MERGE on the table's key columns with
insert/update/delete ops —

    MERGE INTO t USING batch ON t.key = batch.key
      WHEN MATCHED AND batch.op = 'D' THEN DELETE
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED AND batch.op != 'D' THEN INSERT *

Physical design — **union-aggregate merge**: instead of (dedup-shuffle the
batch) + (key-shuffle both join sides) + (bucket repartition), the current
rows are unioned UNDER the batch at an always-losing sequence number
(``-1``, or their stored ``_seq`` for seq-guarded tables) and one
``groupBy(key).agg(max(struct(seq, op, ...)))`` picks the winner per key:

    winner(key) = max over {current row @ seq=-1} ∪ {batch events @ seq}

This folds in-batch dedup AND the merge join into ONE hash aggregate with
map-side partial aggregation (hot keys combine locally before the exchange),
so the whole merge is: scan -> one key-hash shuffle -> one bucket
repartition -> write. Winners with op='D' are dropped (or tombstoned when
the table has a ``_deleted`` column).

Strategies:
- **late-materialization** (initial load / backfill into an EMPTY table):
  a narrow (keys, seq, op) phase picks each key's winning seq — content
  bytes are never read — then the winning seqs broadcast back against the
  full scan so only winner rows carry payload through the bucket exchange.
  ~2x the single-pass throughput at every core count (BENCH.md); gated by
  batch size (the broadcast is key-set-sized).
- **single-pass** (bursts/backfills into non-empty tables): everything in
  ONE Spark action; batch stats ride along via ``pyspark.sql.Observation``
  (no extra pass).
- **pruned** (steady-state CDC: batch small vs table): a cheap pre-pass over
  the deduped batch finds the touched buckets; only those buckets' files are
  read and rewritten (copy-on-write). At 100 TB this is the default — batch
  cost scales with batch locality, not table size. (Also used under
  foreachBatch, where Observation metrics never fire.)

Session-state caveat (Spark 4.1): the first ``Observation`` use materializes
``SparkSession.observationManager`` (a lazy val, NOT java-Serializable).
Harmless for DataFrame jobs, but an MLlib model whose ``trainingSummary``
holds the session (e.g. ``LogisticRegressionModel.transform``) will then fail
Task-not-serializable in the same session. Workaround for ML-after-merge
callers: save/load the model (drops the summary) before ``transform`` — our
own fit path (``ops/classifier.py``) only lifts coefficients, so it is immune.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from table2qb_spark.cdc.dedup import dedup_max_seq
from table2qb_spark.lake.table import LakeTable, key_bucket_expr

# Batches larger than this fraction of the table's rows skip the pruning
# pre-pass (they would touch ~every bucket anyway).
PRUNE_THRESHOLD = 0.2


def _cdf_changes(
    agged, keys: list[str], data_cols: list[str], value_cols: list[str],
    tombstones: bool, delete_op: str,
):
    """Change-feed rows derived from the SAME aggregate that decides the
    merge winners (``__p`` = winning payload, ``__b`` = the current row's
    payload or NULL): op/before/after exactly as the post-hoc snapshot
    diff would classify them, at zero extra table reads. Keys the batch
    did not win (untouched rows, stale seq-guarded events) emit nothing.
    See lake/cdf.py for the full capture/read contract."""
    p_won = F.col("__p.__pri") == 1

    def image(src: str):
        fields = []
        for c in data_cols:
            if c in keys:
                fields.append(F.col(c).alias(c))
            elif c == "_seq":
                fields.append(F.col(f"{src}.__seq").alias("_seq"))
            elif c == "_deleted":
                fields.append(
                    (F.col(f"{src}.__op") == delete_op).alias("_deleted")
                )
            else:
                fields.append(F.col(f"{src}.{c}").alias(c))
        return F.struct(*fields)

    before = F.when(F.col("__b").isNotNull(), image("__b"))
    if tombstones:
        # tombstone tables keep a physical row for deletes: the feed mirrors
        # the physical model (what read() and therefore the diff see)
        after = image("__p")
        op = F.when(F.col("__b").isNull(), F.lit("c")).otherwise(F.lit("u"))
    else:
        after_live = F.col("__p.__op") != delete_op
        after = F.when(after_live, image("__p"))
        op = (
            F.when(after_live & F.col("__b").isNull(), F.lit("c"))
            .when(after_live, F.lit("u"))
            .when(F.col("__b").isNotNull(), F.lit("d"))
        )
    return (
        agged.where(p_won)
        .select(op.alias("op"), *keys, before.alias("before"),
                after.alias("after"))
        .where(F.col("op").isNotNull())
    )


def merge_patch(
    table: LakeTable,
    batch_df: DataFrame,
    commit_id: str,
    op_col: str = "op",
    seq_col: str = "seq",
    summary_update: dict | None = None,
    publish: bool = True,
) -> dict:
    """Apply one change batch under PARTIAL-UPDATE semantics (the
    ``cdc/patch.py`` merge engine, wired to the lake): a ``U`` payload's
    null column means "leave the stored value", an ``I`` replaces the whole
    row (its nulls are real), a final ``D`` removes the key, and a
    post-delete ``U`` revives onto an empty row. For full-row-image streams
    use :func:`merge_upsert` — this engine exists for MySQL
    ``binlog_row_image=MINIMAL`` / Mongo ``$set``-shaped logs where
    last-row-wins would null every untouched column. Ops are the engine
    vocabulary I/U/D (the patch algebra's boundary logic is defined on it).

    Physical shape mirrors the upsert merge's union-aggregate design:
    current rows union UNDER the batch as row images — live rows as ``I``,
    tombstones as ``D``, at seq ``-1`` (their stored ``_seq`` on
    seq-guarded tables) — then ONE map-side-combined ``groupBy(key)``
    (``cdc.patch.patch_fold``) folds merge + in-batch patch resolution,
    then the bucket repartition for the write — scan, one key shuffle, one
    bucket shuffle. Steady-state batches prune to touched buckets exactly
    like ``merge_upsert`` (same narrow stats pre-pass, same
    ``PRUNE_THRESHOLD``). Idempotent via commit manifests; exactly-once
    replay composes because ``patch_merge``'s base-as-insert algebra IS
    this union (tests prove resume == one-shot).

    Seq-guard/tombstone semantics come FREE from the algebra: a tombstone
    re-enters as a ``D`` row image at its stored ``_seq``, so it shadows
    every older (late/redelivered) event and stays a physical ``_deleted``
    row unless a NEWER event revives the key — on tombstone tables dead
    keys are kept as null-payload tombstone rows (what the seq-guarded
    ``read_live`` contract expects) instead of dropped.

    Late-event contract (authoritative-state-wins, the same as the
    seq-guarded upsert merge): an event below the stored row image's seq is
    superseded WHOLESALE — in particular a late ``I`` does NOT back-fill
    columns the folded state never set (the fold cannot distinguish
    "never patched" from "explicitly null"). Total-order patch semantics
    require in-order delivery across batches, which the batch replayer's
    disjoint ascending seq ranges guarantee; within a batch any order is
    fine (the fold is order-free).

    Change-data-feed note: the patch engine does NOT capture a CDF feed on
    ``cdf.enabled`` tables (no ``cdf_sid`` marker is set) — readers fall
    back to the snapshot diff, which is correct for these COW rewrites
    (see ``lake/cdf.py``'s not-captured list).
    """
    if table.has_commit(commit_id):
        return {"skipped": True, "commit_id": commit_id}

    t0 = time.time()
    snap = table.snapshot()
    keys = snap.key_columns
    data_cols = [c["name"] for c in snap.current_schema()]
    seq_guard = "_seq" in data_cols
    tombstones = "_deleted" in data_cols
    value_cols = [
        c for c in data_cols if c not in keys and c not in ("_seq", "_deleted")
    ]
    delete_op = "D"

    decl = {c["name"]: c["type"] for c in snap.current_schema()}
    required = list(dict.fromkeys(keys + value_cols + [op_col, seq_col]))
    missing = [c for c in required if c not in batch_df.columns]
    if missing:
        raise ValueError(f"Batch is missing columns {missing}")
    batch_sel = batch_df.select(
        *[F.col(k).cast(decl[k]).alias(k) for k in keys],
        F.col(seq_col).cast("long").alias("__seq"),
        F.col(op_col).alias("__op"),
        *[F.col(c).cast(decl[c]).alias(c) for c in value_cols],
    )

    table_rows = int(snap.summary.get("row_count", 0) or 0)

    # Narrow stats pre-pass (keys/op/seq only — Catalyst prunes the scan):
    # touched buckets + event counts in one tiny aggregate, same shape the
    # upsert merge uses for its pruned strategy.
    bucket_stats = (
        batch_sel.groupBy(
            key_bucket_expr(keys, snap.n_buckets).alias("__bucket")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("__op") == delete_op, 1).otherwise(0)
            ).alias("dels"),
            F.max("__seq").alias("max_seq"),
        )
        .collect()
    )
    n_total = sum(int(r["n"]) for r in bucket_stats)
    n_dels = sum(int(r["dels"] or 0) for r in bucket_stats)
    max_seq = max(
        (s for s in (r["max_seq"] for r in bucket_stats) if s is not None),
        default=None,
    )
    touched = sorted(r["__bucket"] for r in bucket_stats)
    use_pruning = table_rows > 0 and n_total < PRUNE_THRESHOLD * table_rows

    if not touched:
        table.commit_files(
            commit_id, [], {}, dict(summary_update or {}),
            base_snapshot_id=snap.snapshot_id, publish=publish,
        )
        return {
            "skipped": False, "commit_id": commit_id, "affected_buckets": 0,
            "upserts": 0, "deletes": 0, "strategy": "patch-pruned",
            "seconds": time.time() - t0,
        }

    current = table.read(buckets=touched if use_pruning else None)
    cur_seq = F.col("_seq") if seq_guard else F.lit(-1).cast("long")
    # stored state re-enters as its own row image: live rows are
    # authoritative inserts, tombstones are deletes at their guard seq
    cur_op = (
        F.when(
            F.coalesce(F.col("_deleted"), F.lit(False)), F.lit(delete_op)
        ).otherwise(F.lit("I"))
        if tombstones
        else F.lit("I")
    )
    current_sel = current.select(
        *keys,
        cur_seq.alias("__seq"),
        cur_op.alias("__op"),
        *[F.col(c) for c in value_cols],
    )

    from table2qb_spark.cdc.patch import patch_fold, resolve_patch_col

    folded = patch_fold(
        current_sel.unionByName(batch_sel),
        keys,
        seq_col="__seq",
        op_col="__op",
        value_cols=value_cols,
    )
    winners = folded.select(
        *keys,
        F.col("__last.s").alias("__seq"),
        (F.col("__last.o") == delete_op).alias("__dead"),
        *[resolve_patch_col(c) for c in value_cols],
    )
    out_cols = list(keys) + value_cols
    if seq_guard:
        winners = winners.withColumn("_seq", F.col("__seq"))
        out_cols.append("_seq")
    if tombstones:
        # dead keys stay as physical tombstone rows (null payload — no
        # candidate survives the final D boundary by construction)
        winners = winners.withColumn("_deleted", F.col("__dead"))
        out_cols.append("_deleted")
    else:
        winners = winners.where(~F.col("__dead"))
    merged = winners.select(*out_cols).withColumn(
        "__bucket", key_bucket_expr(keys, snap.n_buckets)
    )
    new_files = table.write_data_files(
        merged, snapshot_hint=f"{snap.snapshot_id + 1:08d}", repartition=True
    )
    affected = (
        touched if use_pruning
        else sorted(set(new_files) | {int(b) for b in snap.files})
    )
    for b in affected:
        new_files.setdefault(b, [])
    su = dict(summary_update or {})
    su.setdefault("max_seq", max_seq)
    table.commit_files(
        commit_id, affected, new_files, su,
        base_snapshot_id=snap.snapshot_id, publish=publish,
    )
    return {
        "skipped": False,
        "commit_id": commit_id,
        "affected_buckets": len(affected),
        "upserts": n_total - n_dels,
        "deletes": n_dels,
        "strategy": "patch-pruned" if use_pruning else "patch",
        "seconds": time.time() - t0,
    }


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
    publish: bool = True,
    branch: str | None = None,
) -> dict:
    """Apply one change batch. Returns merge stats. Idempotent: a commit_id
    already present in the snapshot history is skipped outright.

    ``publish=False`` STAGES the commit (write-audit-publish): the snapshot
    header + manifests are written but VERSION never moves and no commit
    marker lands — audit via ``read(snapshot_id=...)``, then
    ``table.publish_snapshot`` / ``table.discard_snapshot``.
    ``batch_size_hint``: approximate event count (e.g. the seq-range width) —
    picks pruned vs single-pass without counting the batch.
    ``force_stats_pass``: always run the explicit stats pre-pass (required
    inside streaming foreachBatch, where Observation metrics never fire).
    ``branch``: merge onto that branch's head (reads the BRANCH state, not
    main) and stage the result as a branch-owned snapshot — the audit-branch
    workflow; ``table.fast_forward`` publishes the chain."""
    if table.has_commit(commit_id) or (
        branch is not None and table._branch_has_commit(branch, commit_id)
    ):
        return {"skipped": True, "commit_id": commit_id}

    t0 = time.time()
    snap = (
        table.snapshot(table.branch_head(branch))
        if branch is not None
        else table.snapshot()
    )
    keys = snap.key_columns
    data_cols = [c["name"] for c in snap.current_schema()]

    # seq-guarded tables carry ``_seq`` (stored per-row sequence): an incoming
    # row wins only when its seq >= the stored one — out-of-order delivery
    # ACROSS batches is safe. ``_deleted`` adds tombstones (logical deletes)
    # so a late lower-seq update cannot resurrect a deleted key. The batch
    # replayer needs neither (its seq ranges are totally ordered); the
    # streaming path uses both. Read converged state via read_live().
    seq_guard = "_seq" in data_cols
    tombstones = "_deleted" in data_cols
    value_cols = [c for c in data_cols if c not in keys and c not in ("_seq", "_deleted")]

    # Change-data-feed capture (lake/cdf.py, opt-in table property): the
    # winner aggregate below also keeps the current row's payload per key,
    # so before/after images cost zero extra table reads; the aggregate is
    # persisted once and both the feed and the data files derive from it.
    # Late-materialization backfills skip capture (the feed would force a
    # second pass over the whole batch) — readers fall back to the diff.
    from table2qb_spark.lake.cdf import cdf_enabled, write_change_feed

    # Branch commits skip CDF capture: the feed's cdf_sid contract names the
    # CHILD snapshot id, which on a branch is a free slot unknown until the
    # header lands — consumers of a fast-forwarded chain fall back to the
    # (composing) snapshot diff for those steps.
    cdf_on = cdf_enabled(snap) and branch is None

    required = list(dict.fromkeys(keys + value_cols + [op_col, seq_col]))
    missing = [c for c in required if c not in batch_df.columns]
    if missing:
        raise ValueError(f"Batch is missing columns {missing}")
    # Align batch columns to the table's DECLARED types at ingest (a batch
    # built from inferred-schema sources arrives as e.g. bigint where the
    # table declares int; writing it verbatim plants parquet files whose
    # physical type contradicts the table schema — every later read fails
    # with PARQUET_COLUMN_DATA_TYPE_MISMATCH). Cast is a no-op when types
    # already match; under ANSI mode (Spark 4 default) a narrowing overflow
    # fails THIS write loudly instead of corrupting the table.
    decl = {c["name"]: c["type"] for c in snap.current_schema()}
    batch_sel = batch_df.select(
        *[F.col(k).cast(decl[k]).alias(k) for k in keys],
        F.col(seq_col).cast("long").alias("__seq"),
        F.lit(1).alias("__pri"),  # seq ties: batch beats stored (see below)
        F.col(op_col).alias("__op"),
        *[F.col(c).cast(decl[c]).alias(c) for c in value_cols],
    )
    if two_phase_dedup:
        # explicit salted pre-combine for single-key bursts, then the main agg
        batch_sel = dedup_max_seq(
            batch_sel, keys, seq_col="__seq", two_phase=True
        )

    table_rows = int(snap.summary.get("row_count", 0) or 0)

    # Backfill/initial-replay fast path (empty table, plain batch): LATE
    # MATERIALIZATION. The wide exchange is the DRAM-bandwidth bottleneck at
    # high core counts, and most of its bytes are payload columns (content)
    # for rows that LOSE the merge. Phase 1 shuffles only (keys, seq, op) —
    # an order-of-magnitude narrower row — to pick each key's winning seq;
    # phase 2 broadcast-joins the winning seqs back against the batch scan,
    # so only winner rows (1/dup-factor of the batch) carry their payload
    # through the bucket exchange. Duplicate deliveries of a winning seq
    # both pass the join; the bucket window below keeps exactly one.
    # seq values need only be unique PER KEY (the merge contract): a foreign
    # key's event sharing a winning seq value passes the join too, but the
    # bucket window re-picks the max per key among fetched rows. Delete
    # winners MUST be fetched too (not pre-filtered out of the broadcast):
    # a key's winning seq is its MAX seq, so with every winner seq present
    # the window's per-key max is always the true winner, and the op filter
    # below drops the delete-winner keys. Excluding delete winners instead
    # would resurrect a deleted key whose lower-seq update collides with
    # another key's winning seq.
    # Seq-guarded/tombstone tables qualify too when EMPTY: with no current
    # rows the guard reduces to in-batch max-seq-wins, and delete winners
    # become tombstone rows instead of being dropped — so the streaming
    # path's initial backfill (force_stats_pass, empty table) also takes
    # this path, with an explicit narrow stats pre-pass standing in for the
    # Observation (which never fires inside foreachBatch).
    # The broadcast build side is one winning seq per distinct key — at an
    # initial load of HUNDREDS of millions of keys that exceeds Spark's
    # broadcast limits (512M rows / 8 GB) and the driver's memory, so very
    # large hinted batches fall back to the single-pass shuffle (or,
    # better, the bucketed zero-broadcast layout in cdc/bucketed.py).
    max_events = int(os.environ.get("SPARK_GRAFT_LATE_MAT_MAX_EVENTS", 100_000_000))
    late_mat = (
        os.environ.get("SPARK_GRAFT_LATE_MAT", "1") != "0"  # bench A/B lever
        and table_rows == 0
        and not two_phase_dedup
        and (batch_size_hint is None or batch_size_hint <= max_events)
    )
    if late_mat:
        t_obs = None
        narrow = batch_sel.select(*keys, "__seq", "__op")
        stats_aggs = [
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("__op") == delete_op, 1).otherwise(0)).alias("dels"),
            F.max("__seq").alias("max_seq"),
        ]
        if force_stats_pass:
            got = narrow.agg(*stats_aggs).collect()[0]
        else:
            t_obs = Observation(f"merge-lm-{commit_id}")
            narrow = narrow.observe(t_obs, *stats_aggs)
        # NO distinct on the build side: two keys sharing a winning seq value
        # put two wseq=s rows in the build relation, so probe rows with that
        # seq match twice — but the duplicates are IDENTICAL rows and the
        # bucket window's last-row detection keeps exactly one (same as
        # duplicate deliveries). Cross-key collisions are rare, while a
        # distinct costs a whole extra shuffle + stage on the critical path.
        win_seqs = narrow.groupBy(*keys).agg(F.max("__seq").alias("__wseq")).select(
            "__wseq"
        )
        fetched = batch_sel.join(
            F.broadcast(win_seqs), batch_sel["__seq"] == F.col("__wseq"), "inner"
        ).drop("__wseq")

        from pyspark.sql.window import Window

        bucketed = fetched.withColumn(
            "__bucket", key_bucket_expr(keys, snap.n_buckets)
        ).repartition(snap.n_buckets, F.col("__bucket"))
        w = Window.partitionBy("__bucket").orderBy(
            *[F.col(k) for k in keys], F.col("__seq"), F.col("__pri")
        )
        last = F.lead(F.lit(1)).over(w).isNull()
        for k in keys:
            last = last | ~F.lead(F.col(k)).over(w).eqNullSafe(F.col(k))
        winners = bucketed.withColumn("__last", last).where(F.col("__last"))
        lm_cols = list(keys) + value_cols
        if seq_guard:
            winners = winners.withColumn("_seq", F.col("__seq"))
            lm_cols.append("_seq")
        if tombstones:
            winners = winners.withColumn("_deleted", F.col("__op") == delete_op)
            lm_cols.append("_deleted")
        else:
            winners = winners.where(F.col("__op") != delete_op)
        merged = winners.select(*lm_cols, "__bucket")
        new_files = table.write_data_files(
            merged, snapshot_hint=f"{snap.snapshot_id + 1:08d}", repartition=False
        )
        if t_obs is not None:
            got = t_obs.get
        n_total = int(got["n"] or 0)
        n_dels = int(got["dels"] or 0)
        affected = sorted(set(new_files) | {int(b) for b in snap.files})
        for b in affected:
            new_files.setdefault(b, [])
        su = dict(summary_update or {})
        su.setdefault("max_seq", got["max_seq"])
        table.commit_files(
            commit_id, affected, new_files, su,
            base_snapshot_id=snap.snapshot_id, publish=publish, branch=branch,
        )
        return {
            "skipped": False,
            "commit_id": commit_id,
            "affected_buckets": len(affected),
            "upserts": n_total - n_dels,
            "deletes": n_dels,
            "strategy": "late-materialization",
            "seconds": time.time() - t0,
        }

    # Stats and strategy are DECOUPLED (round 4): force_stats_pass (inside
    # streaming foreachBatch, where Observation metrics never fire) forces
    # an explicit narrow stats pre-pass — NOT the pruned strategy. The old
    # coupling forced the two-shuffle aggregate path onto backlog-sized
    # triggers where the one-shuffle window merge is right (measured +2.4s
    # on a 1M-event incremental trigger). The pre-pass itself costs ~0.3s:
    # Catalyst prunes its scan to (keys, seq, op) only. A bonus: the TRUE
    # batch size from the pass now picks the strategy — streaming triggers
    # carry no batch_size_hint, so they previously could never prune.
    stats_rows = None
    if force_stats_pass:
        stats_rows = (
            batch_sel.groupBy(
                key_bucket_expr(keys, snap.n_buckets).alias("__bucket")
            )
            .agg(
                F.count("*").alias("n"),
                F.sum(F.when(F.col("__op") == delete_op, 1).otherwise(0)).alias(
                    "dels"
                ),
                F.max("__seq").alias("max_seq"),
            )
            .collect()
        )
        n_batch = sum(int(r["n"]) for r in stats_rows)
        use_pruning = table_rows > 0 and n_batch < PRUNE_THRESHOLD * table_rows
    else:
        use_pruning = (
            table_rows > 0
            and batch_size_hint is not None
            and batch_size_hint < PRUNE_THRESHOLD * table_rows
        )

    observation = None
    if use_pruning:
        # pre-pass: touched buckets + batch stats in one tiny aggregate
        bucket_stats = stats_rows if stats_rows is not None else (
            batch_sel.groupBy(key_bucket_expr(keys, snap.n_buckets).alias("__bucket"))
            .agg(
                F.count("*").alias("n"),
                F.sum(F.when(F.col("__op") == delete_op, 1).otherwise(0)).alias("dels"),
                F.max("__seq").alias("max_seq"),
            )
            .collect()
        )
        affected = sorted(r["__bucket"] for r in bucket_stats)
        n_total = sum(int(r["n"]) for r in bucket_stats)
        n_dels = sum(int(r["dels"] or 0) for r in bucket_stats)
        max_seq = max(
            (s for s in (r["max_seq"] for r in bucket_stats) if s is not None),
            default=None,
        )  # a bucket whose events all have null seq yields max_seq=None
        if not affected:
            su0 = dict(summary_update or {})
            if cdf_on:  # captured-and-empty: readers skip, never diff
                su0.update({"cdf_rows": 0,
                            "cdf_sid": snap.snapshot_id + 1})
            table.commit_files(
                commit_id, [], {}, su0,
                base_snapshot_id=snap.snapshot_id, publish=publish, branch=branch,
            )
            return {
                "skipped": False, "commit_id": commit_id, "affected_buckets": 0,
                "upserts": 0, "deletes": 0, "strategy": "pruned",
                "seconds": time.time() - t0,
            }
        current = table.read(
            snapshot_id=None if branch is None else snap.snapshot_id,
            buckets=affected,
        )
    else:
        if stats_rows is not None:
            # explicit stats already collected: single-pass strategy with no
            # Observation (which would never fire inside foreachBatch)
            n_total = sum(int(r["n"]) for r in stats_rows)
            n_dels = sum(int(r["dels"] or 0) for r in stats_rows)
            max_seq = max(
                (s for s in (r["max_seq"] for r in stats_rows) if s is not None),
                default=None,
            )
        else:
            observation = Observation(f"merge-{commit_id}")
            batch_sel = batch_sel.observe(
                observation,
                F.count(F.lit(1)).alias("n"),
                F.sum(F.when(F.col("__op") == delete_op, 1).otherwise(0)).alias("dels"),
                F.max("__seq").alias("max_seq"),
            )
        affected = None  # every bucket is replaced
        current = table.read(
            snapshot_id=None if branch is None else snap.snapshot_id
        )

    # current rows enter the contest below every batch event: at their stored
    # _seq (guarded tables) or at -1 (seq ranges are totally ordered, any
    # batch event is newer). Tombstoned rows re-enter as op='D' so they keep
    # winning over nothing and stay tombstones.
    cur_seq = F.col("_seq") if seq_guard else F.lit(-1).cast("long")
    cur_op = (
        F.when(F.coalesce(F.col("_deleted"), F.lit(False)), F.lit(delete_op)).otherwise(F.lit("U"))
        if tombstones
        else F.lit("U")
    )
    current_sel = current.select(
        *keys,
        cur_seq.alias("__seq"),
        F.lit(0).alias("__pri"),
        cur_op.alias("__op"),
        *[F.col(c) for c in value_cols],
    )

    # The winner payload: __pri sits right after __seq in the ordering so an
    # incoming event whose seq EQUALS the stored row's _seq deterministically
    # wins (including deletes — 'D' would otherwise lose a lexicographic tie
    # to 'U'), honouring "incoming wins when its seq >= the stored one".
    payload = F.struct(
        F.col("__seq"), F.col("__pri"), F.col("__op"), *[F.col(c) for c in value_cols]
    )
    both = current_sel.unionByName(batch_sel)

    use_agg = use_pruning or cdf_on  # capture needs the aggregate's images
    agged = None
    if use_agg:
        # pruned/steady-state: small dup-heavy batches benefit from map-side
        # partial aggregation (ONE hash aggregate = in-batch dedup + merge
        # decision), then a bucket repartition for the write. With CDF on,
        # a second per-key struct keeps the CURRENT row's payload — the
        # before image — and the aggregate is persisted so the feed write
        # and the data write are two cheap reads of one computation.
        agg_cols = [F.max(payload).alias("__p")]
        if cdf_on:
            agg_cols.append(
                F.max(F.when(F.col("__pri") == 0, payload)).alias("__b")
            )
        agged = both.groupBy(*keys).agg(*agg_cols)
        if cdf_on:
            agged = agged.persist()
        winners = agged.select(
            *keys,
            F.col("__p.__seq").alias("__seq"),
            F.col("__p.__op").alias("__op"),
            *[F.col(f"__p.{c}").alias(c) for c in value_cols],
        )
        write_repartition = True
    else:
        # single-pass/backfill: ONE wide shuffle total. The bucket is a pure
        # function of the keys, so repartitioning by __bucket co-locates every
        # key's rows; a bucket-partitioned window then takes the max-payload
        # row per key with NO further exchange (the window's required
        # clustering is already satisfied), and the output is bucket-aligned
        # so the write needs no second repartition either. vs the aggregate
        # form this halves shuffled bytes — the scarce resource when 4N cores
        # share one memory system — and skips the hash table (mostly-distinct
        # keys make partial aggregation pure overhead on big batches).
        # ordering stops at (__seq, __pri) — equal (key, seq) beyond __pri is
        # an exact duplicate delivery (seq unique per key), and content-bearing
        # payload structs as sort keys measured 2x slower; scalar per-key
        # leads likewise beat a struct lead
        from pyspark.sql.window import Window

        bucketed = both.withColumn(
            "__bucket", key_bucket_expr(keys, snap.n_buckets)
        ).repartition(snap.n_buckets, F.col("__bucket"))
        w = Window.partitionBy("__bucket").orderBy(
            *[F.col(k) for k in keys], F.col("__seq"), F.col("__pri")
        )
        # null-safe group-end detection: lead(lit(1)) is NULL only at the
        # partition's last row (lead(key).isNull() would also fire mid-stream
        # when the NEXT key is genuinely NULL), and eqNullSafe treats NULL
        # keys as a real group — lead(k) != k evaluates to NULL for them,
        # silently keeping/dropping whole NULL-key groups
        last = F.lead(F.lit(1)).over(w).isNull()
        for k in keys:
            last = last | ~F.lead(F.col(k)).over(w).eqNullSafe(F.col(k))
        winners = bucketed.withColumn("__last", last).where(F.col("__last"))
        write_repartition = False

    out_cols = list(keys) + value_cols
    if seq_guard:
        winners = winners.withColumn("_seq", F.col("__seq"))
        out_cols.append("_seq")
    if tombstones:
        winners = winners.withColumn("_deleted", F.col("__op") == delete_op)
        out_cols.append("_deleted")
    else:
        winners = winners.where(F.col("__op") != delete_op)
    if use_agg:
        merged = winners.select(*out_cols).withColumn(
            "__bucket", key_bucket_expr(keys, snap.n_buckets)
        )
    else:
        merged = winners.select(*out_cols, "__bucket")

    cdf_su: dict = {}
    if cdf_on:
        changes = _cdf_changes(
            agged, keys, data_cols, value_cols, tombstones, delete_op
        )
        rel, n_changes = write_change_feed(
            table, changes, f"{snap.snapshot_id + 1:08d}"
        )
        cdf_su = {"cdf_dir": rel, "cdf_rows": n_changes,
                  "cdf_sid": snap.snapshot_id + 1}

    new_files = table.write_data_files(
        merged, snapshot_hint=f"{snap.snapshot_id + 1:08d}", repartition=write_repartition
    )
    if cdf_on:
        agged.unpersist()

    if observation is not None:
        got = observation.get
        n_total = int(got["n"] or 0)
        n_dels = int(got["dels"] or 0)
        max_seq = got["max_seq"]
    if affected is None:  # single-pass replaces every previously-filled bucket
        affected = sorted(set(new_files) | {int(b) for b in snap.files})
    # buckets that lost all rows still count as replaced (their old files go)
    for b in affected:
        new_files.setdefault(b, [])

    su = dict(summary_update or {})
    su.update(cdf_su)
    su.setdefault("max_seq", max_seq)
    table.commit_files(
        commit_id, affected, new_files, su,
        base_snapshot_id=snap.snapshot_id, publish=publish, branch=branch,
    )
    return {
        "skipped": False,
        "commit_id": commit_id,
        "affected_buckets": len(affected),
        "upserts": n_total - n_dels,
        "deletes": n_dels,
        "strategy": ("pruned" if use_pruning
                     else "agg-cdf" if cdf_on else "single-pass"),
        "seconds": time.time() - t0,
    }
