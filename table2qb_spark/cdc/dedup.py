"""Max-sequence-number-wins deduplication per key (SURVEY.md §2.6/§2.7).

The change log may deliver duplicates and out-of-order events; sequence
numbers are authoritative. Within a batch the winner per (key) is the event
with the highest ``seq`` (full-row struct comparison breaks exact-duplicate
ties deterministically).

Spark-first design notes:
- The default path is ``groupBy(key).agg(max(struct(seq, ...)))`` — a hash
  aggregate with **map-side partial aggregation**, so a hot key combines
  locally on every input partition before one shuffled row per partition
  reaches the reducer. That alone removes most key skew.
- ``two_phase=True`` adds an explicit salt stage
  (``groupBy(key, salt) -> groupBy(key)``) for the adversarial case where a
  single key owns a large share of an *entire batch* (hot-repo burst): stage
  one spreads the key across ``n_salt`` reducers, stage two combines the
  ``n_salt`` survivors. Use for known-skewed streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_max_seq(
    df: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    two_phase: bool = False,
    n_salt: int = 16,
) -> DataFrame:
    """Latest event per key. Output columns = input columns (seq included)."""
    value_cols = [c for c in df.columns if c not in key_cols]
    ordered = [seq_col] + [c for c in value_cols if c != seq_col]
    payload = F.struct(*[F.col(c) for c in ordered])

    if two_phase:
        salted = df.withColumn("__salt", F.pmod(F.xxhash64(F.col(seq_col)), F.lit(n_salt)))
        stage1 = salted.groupBy(*key_cols, "__salt").agg(F.max(payload).alias("__p"))
        winners = stage1.groupBy(*key_cols).agg(F.max("__p").alias("__p"))
    else:
        winners = df.groupBy(*key_cols).agg(F.max(payload).alias("__p"))

    return winners.select(*key_cols, *[F.col(f"__p.{c}").alias(c) for c in ordered])


def hot_keys(df: DataFrame, key_cols: list[str], top_k: int = 20) -> DataFrame:
    """Skew diagnostic: the top-k hottest keys by event count — the report
    read before deciding ``two_phase``/``n_salt`` (or AQE skew-join limits)
    for a stream whose key distribution is unknown.

    Scale shape: ONE map-side-combined count aggregate (a hot key combines
    locally on every input partition — the diagnostic itself cannot be
    skewed by the skew it measures), then a global top-k that compiles to
    TakeOrderedAndProject: per-partition bounded heaps, only k rows per
    partition ever move. Key columns break count ties so the result is
    deterministic on every engine.

    Output: key columns + ``n_events`` (desc) + ``pct_of_batch`` (share of
    the batch, 4 decimals). The total comes from summing the SAME count
    aggregate (one broadcast row crossJoined back): both branches share the
    count's shuffle, which AQE deduplicates at runtime (ReusedExchange —
    verified in the executed plan), so the raw input is scanned and
    partially aggregated exactly once."""
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("n_events"))
    total = counts.agg(F.sum("n_events").alias("__total"))  # one tiny row
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            *key_cols,
            "n_events",
            F.round(F.col("n_events") / F.col("__total") * 100.0, 4).alias(
                "pct_of_batch"
            ),
        )
        .orderBy(F.desc("n_events"), *key_cols)
        .limit(top_k)
    )
