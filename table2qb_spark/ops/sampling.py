"""Deterministic stratified sampling — the training-data *mixing* primitive.

A large-scale pipeline rarely trains on the raw corpus distribution: it
up/down-weights strata (language, source, quality band) to hit target mixing
ratios. At 100 TB that selection must be:

- **a pure per-row predicate** (one scan, no shuffle, no state),
- **deterministic and engine-independent** (the same row set on every run,
  every executor count, every engine — reproducible training data), and
- **stable under resampling**: raising a stratum's fraction only ADDS rows
  (the kept set at 0.2 is a subset of the kept set at 0.5), because the
  per-row uniform draw is a fixed function of (key, seed), not of the
  fraction.

So: u(row) = first 15 hex digits of md5(key || '|' || seed) as an integer,
scaled to [0, 1); keep iff u < fraction(stratum). md5 (not xxhash64) because
every engine computes it identically — the DuckDB oracle reproduces the
exact row set, which a Bernoulli rand() sample never could.

Spark-first shape: the whole thing compiles to one Catalyst projection +
filter (whole-stage codegen, zero Python), and the md5/conv predicate pushes
below any later joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def uniform_hash(key: Column, seed: int) -> Column:
    """Deterministic uniform [0, SCALE) draw from a key column: 60 bits of
    md5 (15 hex digits — signed-int64-safe) reduced mod SCALE."""
    h = F.md5(F.concat(key.cast("string"), F.lit(f"|{seed}")))
    return F.pmod(F.conv(F.substring(h, 1, 15), 16, 10).cast("long"), F.lit(SCALE))


def sample_stratified(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Keep each row iff its deterministic draw falls under its stratum's
    fraction. Strata absent from ``fractions`` get ``default_fraction``
    (0.0 = drop — explicit mixing lists are the norm)."""
    expr = F.lit(int(round(default_fraction * SCALE)))
    for stratum, f in sorted(fractions.items()):
        expr = F.when(
            F.col(strata_col) == stratum, F.lit(int(round(f * SCALE)))
        ).otherwise(expr)
    return df.where(uniform_hash(F.col(key_col), seed) < expr)


def stratum_stats(
    df: DataFrame,
    stratum_col: str = "lang",
    metric_col: str = "n_chars",
    percentiles: tuple[float, ...] = (0.5, 0.9),
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-stratum corpus statistics — the mixing report read before
    choosing ``sample_stratified`` fractions. One shuffle on the stratum
    key; counts/sums/min/max are map-side combined.

    Percentile modes (round-4 verdict task #8):

    - ``exact=True`` (default, what the DuckDB oracle gates): Spark's
      ``percentile()`` — exact interpolated quantiles, buffers grow with
      the number of DISTINCT metric values. Fine for bounded-domain
      integer metrics (char/token counts); wrong tool for continuous or
      high-cardinality metrics at 100 TB.
    - ``exact=False``: ``approx_percentile()`` (Greenwald-Khanna), O(
      accuracy) state per stratum regardless of corpus size — the
      production path for float scores (perplexity, quality) where an
      exact buffer would hold billions of distinct values per stratum.
      Not oracle-gated (DuckDB's approx sketch differs), so it is pinned
      by a tolerance pytest against the exact path instead.
    """
    fn = "percentile" if exact else "approx_percentile"
    extra = "" if exact else f", {accuracy}"
    pct = [
        F.round(F.expr(f"{fn}({metric_col}, {p}{extra})").cast("double"), 4)
        .alias(f"p{int(p * 100)}_{metric_col}")
        for p in percentiles
    ]
    return df.groupBy(stratum_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(metric_col).cast("long").alias(f"total_{metric_col}"),
        F.round(F.avg(metric_col), 4).alias(f"mean_{metric_col}"),
        *pct,
        F.min(metric_col).cast("long").alias(f"min_{metric_col}"),
        F.max(metric_col).cast("long").alias(f"max_{metric_col}"),
    )


def assign_shards(
    df: DataFrame,
    n_shards: int,
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the training-data
    EXPORT primitive: every example gets a pseudo-random shard in
    [0, n_shards) and a position within that shard, both pure functions of
    (key, seed), so the same corpus always shards identically on any
    engine at any parallelism (reproducible data loading), and changing
    ``seed`` reshuffles globally.

    Output: input columns + ``(shard, pos)``; ``pos`` is 0-based dense
    within each shard, ordered by the same uniform draw (with the key as
    the collision tie-break) — i.e. examples land in shards AND in an
    order uncorrelated with their source order, which is what breaks
    source locality before training.

    Scale shape: the draw is one md5 projection (whole-stage codegen); the
    only shuffle is the implicit exchange under the per-shard window
    (row_number over n_shards keys — each shard sorts corpus/n_shards rows
    with spill, the same sort a shard writer needs anyway). Pick n_shards
    >= executor count so shard sorting parallelizes; pos stays correct for
    any choice."""
    from pyspark.sql.window import Window

    u = uniform_hash(F.col(key_col), seed)
    w = Window.partitionBy("shard").orderBy("u", key_col)
    return (
        df.select("*", u.alias("u"))
        .withColumn("shard", F.pmod(F.col("u"), F.lit(n_shards)).cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("long") - 1)
        .drop("u")
    )
