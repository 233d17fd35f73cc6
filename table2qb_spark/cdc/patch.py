"""Partial-update (patch) merge engine: per-column last-non-null-wins.

Real change streams often carry PARTIAL payloads — MySQL binlog with
``binlog_row_image=MINIMAL``, MongoDB ``$set`` patches, Debezium incremental
snapshots of wide rows — where an update event populates only the columns it
changed and leaves the rest NULL meaning "unchanged". Folding such a stream
with plain max-seq-wins (``cdc.dedup.dedup_max_seq``) silently NULLs every
column the final event didn't touch; the correct merge is per-COLUMN, not
per-row (Apache Paimon ships this as its ``partial-update`` merge engine;
Flink upsert sinks call it partial upsert).

Semantics (per key, events totally ordered by ``seq``):

- ``I`` (insert / full row image): replaces the whole row — its payload is
  authoritative INCLUDING its nulls (a null in an insert is a real null).
- ``U`` (patch): each non-null payload column overwrites the state; null
  payload columns leave the state untouched.
- ``D`` (delete): clears the row. The key is absent from the result iff the
  final event is a delete; a later ``U`` revives the key patching onto an
  EMPTY row (only the columns the revival patches are non-null), a later
  ``I`` revives it wholesale.

Spark-first design — ONE aggregate, ZERO windows:

The naive formulation is a per-key ordered fold (a window sort, or Paimon's
LSM merge). It collapses into a single hash aggregate via two observations:

1. For column ``c``, the winning event is the max-``seq`` *candidate*
   (candidate = ``I``, or ``U`` with ``c`` non-null) — UNLESS that candidate
   is shadowed by a later row-image boundary (``I``/``D``), i.e. unless its
   seq precedes ``s_star = max(seq where op != 'U')``. A candidate at or
   after ``s_star`` is never shadowed (the boundary row itself is either the
   candidate or an earlier event).
2. Whether the key is dead is decided by the final event alone
   (``argmax_seq(op) == 'D'``).

Both are expressible as ``max(struct(...))`` / conditional ``max`` inside
ONE ``groupBy(key)`` — a hash aggregate with map-side partial aggregation,
so a hot key (the skewed-repo case) combines locally on every input
partition before a single row per partition reaches the reducer; no sort,
no window buffer, one shuffle. This strictly beats the sequential-merge
shape the feature has in LSM-based engines.

Reference analog: none (the reference transforms static CSV); this is a
north-rule CDC-surface operator. Oracle: ``cdc_patch_state`` in
entry_queries.py (DuckDB struct-max replica of the same algebra).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def patch_state(
    df: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
    value_cols: list[str] | None = None,
    two_phase: bool = False,
    n_salt: int = 16,
) -> DataFrame:
    """Fold a partial-payload change stream to final state, one row per
    live key: ``key_cols + [seq_col] + value_cols`` where ``seq_col`` is the
    key's final event seq and each value column is the patch-merged value.

    Events must be well-formed (non-null seq/op/key — the replayer's DLQ
    quarantines the rest) with seq unique per key (duplicate delivery of
    the SAME seq is idempotent here: identical payload structs compare
    equal under max).

    ``two_phase`` adds the same explicit salt stage as
    ``dedup_max_seq(two_phase=True)`` for adversarial single-key batches;
    the per-column conditional maxes combine associatively, so stage one
    pre-folds each salt shard and stage two merges the shard winners —
    identical result, bounded reducer fan-in.
    """
    if value_cols is None:
        value_cols = [
            c for c in df.columns if c not in (*key_cols, seq_col, op_col)
        ]
    folded = patch_fold(
        df, key_cols, seq_col, op_col, value_cols,
        two_phase=two_phase, n_salt=n_salt,
    )
    return folded.where(F.col("__last.o") != "D").select(
        *key_cols,
        F.col("__last.s").alias(seq_col),
        *[resolve_patch_col(c) for c in value_cols],
    )


def patch_fold(
    df: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str,
    value_cols: list[str],
    two_phase: bool = False,
    n_salt: int = 16,
) -> DataFrame:
    """The engine's single aggregate, unresolved: per key, ``__last`` =
    struct(s, o) of the final event, ``__s_star`` = last row-image boundary
    seq, ``__w_<c>`` = struct(s, v) of each column's max-seq authoritative
    setter. :func:`patch_state` resolves it for operator callers; the lake
    merge (``lake/merge.py::merge_patch``) resolves it itself so tombstone
    tables can KEEP dead keys as physical rows."""
    seq = F.col(seq_col)
    op = F.col(op_col)

    def candidate(c: str) -> Column:
        """struct(seq, value) when this event authoritatively sets ``c``."""
        sets_c = (op == "I") | ((op == "U") & F.col(c).isNotNull())
        return F.when(
            sets_c, F.struct(seq.alias("s"), F.col(c).alias("v"))
        )

    aggs = [
        F.max(F.struct(seq.alias("s"), op.alias("o"))).alias("__last"),
        F.max(F.when(op != "U", seq)).alias("__s_star"),
        *[F.max(candidate(c)).alias(f"__w_{c}") for c in value_cols],
    ]

    if two_phase:
        salted = df.withColumn(
            "__salt", F.pmod(F.xxhash64(seq), F.lit(n_salt))
        )
        stage1 = salted.groupBy(*key_cols, "__salt").agg(*aggs)
        # Re-merge the shard partials: every agg is an associative max.
        remerge = [
            F.max("__last").alias("__last"),
            F.max("__s_star").alias("__s_star"),
            *[F.max(f"__w_{c}").alias(f"__w_{c}") for c in value_cols],
        ]
        return stage1.groupBy(*key_cols).agg(*remerge)
    return df.groupBy(*key_cols).agg(*aggs)


def resolve_patch_col(c: str) -> Column:
    """Final value of column ``c`` from a :func:`patch_fold` row: the
    winner's value unless a later row-image boundary shadows it."""
    return F.when(
        F.col("__s_star").isNull()
        | (F.col(f"__w_{c}.s") >= F.col("__s_star")),
        F.col(f"__w_{c}.v"),
    ).alias(c)


def patch_merge(
    base: DataFrame,
    events: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Apply a patch-event batch onto existing table state.

    ``base`` is current state (one row per key, carrying ``seq_col`` from
    the commit that produced it — the lake keeps it); every event seq must
    exceed every base seq (the replayer's disjoint seq ranges guarantee
    this). Base rows enter the fold as op='I' row images at their stored
    seq, so the single-aggregate algebra of :func:`patch_state` applies
    unchanged: a patch coalesces onto the base image, an insert replaces
    it, a delete (as final event) removes the key.

    One union + the same one-shuffle aggregate; nothing driver-side.
    """
    if value_cols is None:
        value_cols = [
            c for c in base.columns if c not in (*key_cols, seq_col)
        ]
    base_as_inserts = base.select(
        *key_cols, F.col(seq_col), F.lit("I").alias(op_col), *value_cols
    )
    ev = events.select(
        *key_cols, F.col(seq_col), F.col(op_col), *value_cols
    )
    return patch_state(
        base_as_inserts.unionByName(ev),
        key_cols,
        seq_col=seq_col,
        op_col=op_col,
        value_cols=value_cols,
    )
