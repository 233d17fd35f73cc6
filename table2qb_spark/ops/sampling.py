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


def cap_sources(
    df: DataFrame,
    source_col: str,
    max_rows: int,
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Per-source volume cap (RefinedWeb-style domain balancing): no single
    source/domain contributes more than ~``max_rows`` rows (in expectation)
    to the corpus, chosen deterministically.

    Web-scale corpora are dominated by a few mega-domains; the standard fix
    caps each domain's contribution so the long tail isn't drowned out. The
    obvious SQL — ``row_number() OVER (PARTITION BY source) <= cap`` — is
    hot-key-unsafe at scale: one 10^9-row domain becomes ONE window
    partition (a single task sorting a billion rows). Instead:

    1. one map-side-combined count per source (tiny result: one row per
       distinct source),
    2. per-source keep threshold  min(SCALE, (max_rows*SCALE) div n_s)  —
       integer arithmetic end-to-end so every engine computes the identical
       threshold,
    3. equi-join the counts back and filter on the same deterministic
       ``uniform_hash`` draw as ``sample_stratified``.

    The join strategy is deliberately left to AQE: the distinct-source dim
    is NOT broadcast-safe by construction (a web crawl has ~10^8 registered
    domains), so forcing a broadcast here would repeat the exact failure
    mode of an unbounded forced hint — AQE broadcasts when the measured
    size fits and shuffles otherwise.

    Semantics: the cap holds in expectation (each row of source s keeps
    with probability min(1, max_rows/n_s)); the kept set is a pure function
    of (key, seed, counts) — reproducible across engines and parallelism —
    and monotone: raising ``max_rows`` only ADDS rows. Sources already
    under the cap pass through untouched (threshold saturates at SCALE).
    """
    if max_rows <= 0:
        raise ValueError("max_rows must be > 0")
    counts = df.groupBy(source_col).agg(F.count("*").alias("__src_n"))
    thr = F.least(
        F.lit(SCALE).cast("long"),
        F.expr(f"CAST({int(max_rows) * SCALE} AS BIGINT) div __src_n"),
    )
    return (
        df.join(counts, source_col)
        .where(uniform_hash(F.col(key_col), seed) < thr)
        .select(*df.columns)
    )


def mix_corpus(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    key_col: str,
    seed: int = 42,
    default_weight: float = 0.0,
) -> DataFrame:
    """Deterministic corpus mixing with up- AND down-sampling: each stratum
    row appears ``weight`` times in expectation, exactly reproducibly.

    A training mixture is rarely a pure subsample: common recipes REPEAT
    high-value strata (e.g. "wiki x2.0, books x1.5") while downsampling
    bulk web text ("cc x0.25"). Weight w decomposes as

        floor(w) guaranteed copies (full epochs)
      + one extra copy iff the row's deterministic uniform draw falls
        under frac(w) (the fractional epoch).

    The fractional draw is the same ``uniform_hash`` as
    ``sample_stratified``, so the same stability law holds: raising a
    stratum's weight only ADDS copies — the mixture at w=1.2 contains the
    mixture at w=0.7 row-for-row. Output = input columns + ``epoch``
    (0-based bigint copy index; feed (key, epoch) to ``assign_shards`` so
    repeated copies scatter across shards instead of clumping).

    Scale shape: one Catalyst projection computing n_copies, then a
    generator expansion (explode over ``sequence``) — a pure map stage, no
    shuffle, no state; output volume is exactly sum_s w_s * |s|. Rows with
    n_copies = 0 never leave the scan (explode drops empty arrays).
    """
    if any(w < 0 for w in weights.values()) or default_weight < 0:
        raise ValueError("mixture weights must be >= 0")
    full = F.lit(int(default_weight))
    frac = F.lit(int(round((default_weight % 1.0) * SCALE)))
    for stratum, w in sorted(weights.items()):
        full = F.when(F.col(strata_col) == stratum, F.lit(int(w))).otherwise(full)
        frac = F.when(
            F.col(strata_col) == stratum, F.lit(int(round((w % 1.0) * SCALE)))
        ).otherwise(frac)
    n = full + F.when(uniform_hash(F.col(key_col), seed) < frac, 1).otherwise(0)
    epochs = F.when(n >= 1, F.sequence(F.lit(0), (n - 1).cast("int")))
    # a generator cannot be nested in expressions (no cast around explode);
    # widen the epoch index in a follow-up projection instead
    out = df.select("*", F.explode(epochs).alias("__epoch"))
    return out.select(*df.columns, F.col("__epoch").cast("long").alias("epoch"))


def select_token_budget(
    df: DataFrame,
    budget_tokens: int,
    quality_col: str = "quality",
    token_col: str = "n_tokens",
    key_col: str = "doc_id",
) -> DataFrame:
    """Budget-constrained corpus selection: keep the BEST documents (by
    ``quality_col``, descending; ``key_col`` ascending breaks ties) until
    adding the next one would exceed ``budget_tokens`` — i.e. rows whose
    running token sum in (quality DESC, key ASC) order stays <= budget.

    The naive plan — ``sum(tokens) OVER (ORDER BY quality DESC, key)`` —
    is a GLOBAL ordered window: one task sorts and scans the entire corpus.
    The budget boundary is inherently sequential, but only AT the boundary;
    everything else is a histogram question. So, two phases:

    1. per-quality-value token totals (map-side-combined agg; quality
       scores are rounded to 4 decimals upstream, so the domain is bounded
       at ~10^4 distinct values — a tiny histogram collects to the driver
       regardless of corpus size);
    2. the driver prefix-sums the histogram in quality-descending order:
       every value whose whole bucket fits is admitted with a plain filter
       (one codegen scan), and ONLY the single boundary value runs a
       running-sum window — partitioned on that one quality value, sized
       corpus/|score domain| in expectation, never the corpus.

    Assumes a bounded score domain (round continuous scores upstream —
    ``quality_score_expr`` already does); result is deterministic and
    engine-independent: the DuckDB global-window oracle selects the exact
    same rows."""
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be > 0")
    from pyspark.sql.window import Window

    hist = sorted(
        df.groupBy(quality_col).agg(F.sum(token_col).alias("__t")).collect(),
        key=lambda r: r[quality_col],
        reverse=True,
    )
    running = 0
    boundary_q = None
    remaining = 0
    for r in hist:
        if running + (r["__t"] or 0) <= budget_tokens:
            running += r["__t"] or 0
        else:
            boundary_q = r[quality_col]
            remaining = budget_tokens - running
            break
    if boundary_q is None:  # whole corpus fits
        return df
    full = df.where(F.col(quality_col) > F.lit(boundary_q))
    w = (
        Window.partitionBy(quality_col)
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bnd = (
        df.where(F.col(quality_col) == F.lit(boundary_q))
        .withColumn("__cum", F.sum(token_col).over(w))
        .where(F.col("__cum") <= remaining)
        .drop("__cum")
    )
    return full.unionByName(bnd)


def plan_mixture(
    df: DataFrame,
    strata_col: str,
    token_col: str,
    target_shares: dict[str, float],
    total_tokens: int,
) -> dict[str, float]:
    """Solve for the ``mix_corpus`` weights that hit a token budget: given
    target SHARES per stratum (fractions of the final mixture's tokens,
    summing to <= 1) and the desired mixture size ``total_tokens``, return
    ``{stratum: weight}`` with weight_s = share_s * total_tokens /
    measured_tokens_s.

    One tiny aggregate (|strata| rows to the driver) — the standard
    recipe-planning step before materializing a mixture. Strata with no
    rows (or zero measured tokens) are dropped from the plan rather than
    producing inf/NaN weights."""
    if total_tokens <= 0:
        raise ValueError("total_tokens must be > 0")
    bad = {s: v for s, v in target_shares.items() if v < 0}
    if bad:
        raise ValueError(f"negative target shares: {bad}")
    measured = {
        r[strata_col]: int(r["toks"])
        for r in df.where(F.col(strata_col).isin(list(target_shares)))
        .groupBy(strata_col)
        .agg(F.sum(token_col).cast("long").alias("toks"))
        .collect()
    }
    return {
        s: (share * total_tokens) / measured[s]
        for s, share in target_shares.items()
        if measured.get(s)
    }
