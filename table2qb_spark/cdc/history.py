"""SCD Type-2 history view over a change log — every version of every key
with its validity interval, not just the latest state.

``cdc.dedup.dedup_max_seq`` answers "what is the state NOW" (SCD1); this
answers "what was the state at every point" — the warehouse-standard
slowly-changing-dimension Type 2 shape, and the natural companion to
``cdc.asof.asof_join`` (an as-of probe against the history equals a range
lookup on [valid_from, valid_to)).

Semantics over (key, seq, op, payload):
- every I/U event opens a version at ``valid_from_seq = seq``;
- ANY later event on the same key (including a delete) closes it at
  ``valid_to_seq`` = that event's seq (half-open interval — the closer's
  seq is the first seq at which this version is no longer live);
- a D event closes the prior version and opens nothing;
- ``is_current`` marks versions never closed.

Spark-first: ONE shuffle on the key (window ``lead`` per key ordered by
seq), then a filter dropping delete rows. No join, no driver collection;
per-key version chains can be arbitrarily long (window state is O(1)).
Reference parity: the change-log ordering contract is the same
seq-authoritative one as ``cdc/apply.py`` (SURVEY.md §2 C1/C7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Version history with validity intervals.

    Output: all input columns except ``op_col`` and ``seq_col``, plus
    ``valid_from_seq`` (= this version's seq), ``valid_to_seq`` (seq of the
    next change on the key; null while open) and ``is_current``.

    Seqs are authoritative and unique per key (the same contract every
    merge strategy here enforces); exact duplicate (key, seq) deliveries
    are collapsed first so redelivery cannot fabricate zero-width versions.
    """
    value_cols = [c for c in df.columns if c not in key_cols and c != seq_col]
    payload = F.struct(*[F.col(c) for c in value_cols])

    # ONE exchange + ONE sort serves both the redelivery collapse and the
    # interval close: within a key sorted by (seq, payload), the LAST row of
    # each seq run is the max-struct winner of that seq, and the row
    # immediately after it is the first row of the NEXT seq — so the same
    # lead() yields the winner test and valid_to_seq. (Same single-shuffle
    # window trick as lake/merge.py's sort-merge replay.)
    w = Window.partitionBy(*key_cols).orderBy(seq_col, payload)
    next_seq = F.lead(seq_col).over(w)
    out_cols = [c for c in df.columns if c not in (op_col, seq_col)]
    return (
        df.withColumn("valid_to_seq", next_seq)
        .where(
            (F.col("valid_to_seq").isNull()
             | (F.col("valid_to_seq") != F.col(seq_col)))
            & (F.col(op_col) != delete_op)
        )
        .select(
            *out_cols,
            F.col(seq_col).alias("valid_from_seq"),
            "valid_to_seq",
            F.col("valid_to_seq").isNull().alias("is_current"),
        )
    )


def row_lineage(
    df: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Row-lineage view (Iceberg v3's row lineage re-derived from the log):
    for every key whose final state is LIVE, the identity and age of the
    current row *incarnation* — ``row_id`` assigned when the incarnation was
    created and preserved across updates, a NEW id after delete+re-insert
    (Iceberg v3 spec: carried-over rows keep their id, replacement rows get
    fresh ones).

    Output per live key: ``created_seq`` (first event of the current
    incarnation, i.e. the first event after the key's last delete),
    ``last_updated_seq`` (the winning event — equals the stored ``_seq`` of
    seq-guarded lake tables), ``n_versions`` (events in the incarnation) and
    ``row_id`` = md5 over (keys, created_seq) — deterministic, so replay
    from any checkpoint reproduces identical ids (the exactly-once
    contract extends to lineage).

    Scale shape: ONE exchange on the key — the partition-wide max-delete
    window and the groupBy reuse the same hash partitioning (Catalyst
    reuses the exchange; plan-tested). Deleted keys drop out naturally:
    the incarnation filter ``seq > max_delete_seq`` keeps nothing when the
    key's last event is the delete. Duplicate (key, seq) redeliveries
    collapse in the aggregate except ``n_versions`` counting distinct seqs,
    which makes redelivery invisible there too.
    """
    w = Window.partitionBy(*key_cols)
    max_del = F.max(
        F.when(F.col(op_col) == delete_op, F.col(seq_col))
    ).over(w)
    live = (
        df.withColumn("__max_del", max_del)
        .where(
            (F.col(op_col) != delete_op)
            & (
                F.col("__max_del").isNull()
                | (F.col(seq_col) > F.col("__max_del"))
            )
        )
    )
    agged = live.groupBy(*key_cols).agg(
        F.min(seq_col).alias("created_seq"),
        F.max(seq_col).alias("last_updated_seq"),
        F.count_distinct(F.col(seq_col)).alias("n_versions"),
    )
    return agged.withColumn(
        "row_id",
        F.md5(
            F.concat_ws(
                "\x1f",
                *[F.col(k).cast("string") for k in key_cols],
                F.col("created_seq").cast("string"),
            )
        ),
    )
