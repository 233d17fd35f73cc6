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
