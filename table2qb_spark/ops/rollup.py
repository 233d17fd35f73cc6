"""Hypertable-style time rollup: multi-granularity continuous aggregates
(hour -> day -> total) over an event stream, the timeseries-warehouse
companion to the CDC surfaces (per-grain ingest health, training-corpus
arrival curves).

Spark-first — hierarchical re-aggregation, NOT ``df.rollup``:

  ``DataFrame.rollup(d, h)`` compiles to an Expand node that multiplies
  every SCAN row by the number of grouping levels BEFORE partial
  aggregation — at 100 TB that triples the bytes entering the first
  aggregate. Decomposable aggregates (count/sum/min/max) don't need it:
  aggregate ONCE at the finest grain (map-side combined, so the shuffle
  carries one row per (partition, day, hour) — tiny), then re-aggregate
  the coarser grains FROM the finest-grain result, whose size is bounded
  by the calendar (days x 24), not the corpus. Each coarser level is a
  shuffle of kilobytes.

  Level encoding matches SQL ``GROUPING(d, h)``: bit per column, set when
  that column is aggregated away — 0 = (day, hour), 1 = day, 3 = grand
  total (identical to Spark's ``grouping_id`` and DuckDB's ``grouping``),
  so downstream cube consumers can't tell this wasn't an Expand rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Hour/day/total rollup of row counts and ``value_col`` sums.

    Output: ``d`` (yyyy-MM-dd, null when aggregated away), ``h`` (hour int,
    null when aggregated away), ``lvl`` (GROUPING bitmask), ``n_events``,
    ``sum_value``.
    """
    finest = (
        df.select(
            F.date_format(ts_col, "yyyy-MM-dd").alias("d"),
            F.hour(ts_col).alias("h"),
            F.col(value_col).alias("v"),
        )
        .groupBy("d", "h")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
    )
    # calendar-bounded from here down: re-aggregate the rollup, not the data
    days = finest.groupBy("d").agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    total = finest.groupBy().agg(F.sum("n").alias("n"), F.sum("s").alias("s"))

    def lvl(frame: DataFrame, mask: int, with_d: bool, with_h: bool) -> DataFrame:
        return frame.select(
            (F.col("d") if with_d else F.lit(None).cast("string")).alias("d"),
            (F.col("h") if with_h else F.lit(None).cast("int")).alias("h"),
            F.lit(mask).alias("lvl"),
            F.col("n").alias("n_events"),
            F.round("s", 2).alias("sum_value"),
        )

    return (
        lvl(finest, 0, True, True)
        .unionByName(lvl(days, 1, True, False))
        .unionByName(lvl(total, 3, False, False))
    )
