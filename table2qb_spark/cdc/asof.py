"""As-of (temporal point-in-time) join — the CDC consumer's core lookup:
"what was the state of key K at time T?" asked once per probe row.

The reference's change-log semantics (seq-ordered upserts per key,
doc/usage.md "latest wins") make every downstream read an implicit as-of
at NOW; this operator generalizes it to arbitrary probe timestamps, the
shape a training-data pipeline needs to join events to the dimension
values that were live when the event happened (no future leakage).

Spark-first design — the UNION + running-``last`` plan, not a join:

  A naive formulation is a range join (``l.k = r.k AND r.ts <= l.ts`` then
  keep the max r.ts), which Catalyst executes as a broadcast-nested-loop or
  an exploding theta-join — O(|L| x versions-per-key) and unusable at
  100 TB. Instead both sides are unioned into one stream tagged by side,
  shuffled ONCE on the key, and sorted per key by (ts, side). A single
  window pass carries ``last(right_payload, ignorenulls=True)`` — each left
  row picks up the most recent right version at-or-before its timestamp in
  O(1) state per row. One shuffle, zero join explosion, no driver
  collection; versions-per-key can be arbitrarily large.

  Ties (left.ts == right.ts): the right side sorts FIRST at equal ts, so an
  exactly-simultaneous version IS visible to the probe — matching DuckDB's
  ``ASOF JOIN ... ON l.ts >= r.ts`` (closed bound), which is the oracle.

  ``tolerance_ms`` bounds staleness: a match older than the probe by more
  than the tolerance is nulled out (pandas ``merge_asof`` semantics).

Right-side rows must be unique per (key, ts): like every CDC surface here,
callers dedupe with max-seq-wins first (``cdc.dedup.dedup_max_seq``) —
``asof_join`` raises otherwise only in the sense that the winner among
same-ts versions is the max payload struct (deterministic, documented).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    tolerance_ms: int | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """Left as-of-backward join: every ``left`` row, plus the ``right`` row
    with the greatest ``right_ts`` <= ``left_ts`` for the same key (or
    nulls when no version precedes the probe).

    Output: all ``left`` columns, then ``{right_prefix}{right_ts}`` and each
    non-key right column as ``{right_prefix}{col}``.

    Plan shape: union -> ONE hash exchange on ``on`` -> per-key sort ->
    running ``last(..., ignorenulls=True)`` window -> filter to left rows.
    """
    right_vals = [c for c in right.columns if c not in on and c != right_ts]

    # right payload carried through the window; ts rides inside so the
    # tolerance check needs no second pass
    r_payload = F.struct(
        F.col(right_ts).cast("long").alias("__ts"),
        *[F.col(c) for c in right_vals],
    )
    r_tagged = right.select(
        *[F.col(k) for k in on],
        F.col(right_ts).cast("long").alias("__ts"),
        F.lit(0).alias("__side"),
        r_payload.alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in left.columns],
    )
    l_tagged = left.select(
        *[F.col(k) for k in on],
        F.col(left_ts).cast("long").alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_tagged.schema["__r"].dataType).alias("__r"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )

    # side=0 before side=1 at equal ts => same-instant versions are visible.
    # __r as the final key makes the same-(key,ts) right winner the max
    # payload struct (deterministic; callers dedupe upstream anyway).
    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side", "__r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_tagged.unionByName(r_tagged)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .where(F.col("__side") == 1)
    )

    match = F.col("__match")
    if tolerance_ms is not None:
        match = F.when(
            F.col("__ts") - F.col("__match.__ts") <= F.lit(tolerance_ms),
            F.col("__match"),
        )  # else NULL: match too stale

    out_left = [F.col(f"__l_{c}").alias(c) for c in left.columns]
    out_right = [match["__ts"].alias(f"{right_prefix}{right_ts}")] + [
        match[c].alias(f"{right_prefix}{c}") for c in right_vals
    ]
    return matched.select(*out_left, *out_right)
