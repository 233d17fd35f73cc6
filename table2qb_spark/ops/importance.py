"""DSIR-style data selection: hashed-n-gram importance resampling.

Selects raw-corpus documents that look like a TARGET corpus (the public
Data Selection via Importance Resampling recipe, arXiv:2302.03169): fit
bag-of-hashed-n-grams unigram models p (target) and q (raw), score every
raw doc with its log importance weight sum(log p[b] - log q[b]) over its
n-gram buckets, then draw k docs by Gumbel-top-k (sampling without
replacement proportional to the softmax of the weights) — the standard
trick that turns a weighted sample into ONE deterministic rank.

Everything is deterministic and engine-independent so the DuckDB oracle
reproduces the exact selected set:

- features = lowercased whitespace unigrams + bigrams, hashed to
  ``n_buckets`` via the same 60-bit md5 idiom as ``ops/sampling.py``
  (md5, not xxhash64 — every engine computes it identically);
- smoothing is add-alpha over the bucket space; the corpus totals (two
  scalars) are the ONLY values collected to the driver;
- the Gumbel noise u(doc) comes from ``sampling.uniform_hash`` (a fixed
  function of (id, seed)), g = -ln(-ln u);
- ranking is on the ROUNDED score with id tie-break (the repo-wide
  cross-engine tie-determinism rule — see tfidf_keywords).

Scale shape (100 TB raw corpus, small target):
- target bucket counts: explode + ONE map-side-combined groupBy over <=
  n_buckets keys — target corpora are curated and small by definition;
- raw bucket counts: same aggregate over the raw corpus — the expensive
  pass, but it is one explode + partial-agg scan (the minhash explode
  precedent: the n-gram explode IS the workload);
- the bucket->log_ratio table is <= n_buckets rows (a CONSTRUCTION bound,
  not a data-dependent one: the hash range is the parameter itself), so
  broadcasting it is safe by construction at any corpus size;
- per-doc scoring: explode + broadcast-join + ONE map-side-combined sum
  per doc. No window, no driver loop; top-k is TakeOrderedAndProject.

Reference analog: none (SURVEY.md §2b — training-data surface beyond the
reference).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from table2qb_spark.ops.sampling import SCALE, uniform_hash
from table2qb_spark.ops.text import tokens_expr


def ngram_features_expr(c: Column) -> Column:
    """Unigrams + bigrams of lowercased whitespace tokens, as one array.
    Bigrams join with a single space so the feature string is reproducible
    in any engine (``'quick brown'``)."""
    toks = tokens_expr(c)
    bigrams = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def bucket_expr(feature: Column, n_buckets: int) -> Column:
    """Hash a feature string into [0, n_buckets): 60 bits of md5 reduced
    mod n_buckets — identical in Spark and DuckDB."""
    h = F.conv(F.substring(F.md5(feature), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(n_buckets))


def _bucket_counts(
    df: DataFrame, text_col: str, n_buckets: int, out: str
) -> DataFrame:
    """<= n_buckets rows of (bucket, count): explode + one map-side-combined
    aggregate."""
    feats = F.explode(ngram_features_expr(F.col(text_col))).alias("__feat")
    return (
        df.select(feats)
        .select(bucket_expr(F.col("__feat"), n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias(out))
    )


def importance_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-raw-doc DSIR log importance weight.

    Output: (id_col, n_feats int, log_weight double rounded to 4) — one row
    per raw doc with at least one token; log_weight =
    sum over feature occurrences of ln(p[bucket]) - ln(q[bucket]) with
    p[b] = (t_b + alpha) / (T + alpha*B) fit on the target and q likewise
    on the raw corpus. Higher = more target-like.
    """
    t_counts = _bucket_counts(target, text_col, n_buckets, "t_cnt")
    r_counts = _bucket_counts(raw, text_col, n_buckets, "r_cnt")
    # the two corpus totals are the only driver-side values (two scalars);
    # they fold into per-bucket constants below
    totals_t = t_counts.agg(F.sum("t_cnt")).first()[0] or 0
    totals_r = r_counts.agg(F.sum("r_cnt")).first()[0] or 0
    denom_t = float(totals_t) + alpha * n_buckets
    denom_r = float(totals_r) + alpha * n_buckets

    ratio = (
        t_counts.join(r_counts, "bucket", "full_outer")
        .select(
            "bucket",
            (
                F.log((F.coalesce(F.col("t_cnt"), F.lit(0)) + F.lit(alpha)) / F.lit(denom_t))
                - F.log((F.coalesce(F.col("r_cnt"), F.lit(0)) + F.lit(alpha)) / F.lit(denom_r))
            ).alias("log_ratio"),
        )
    )
    # a bucket no corpus feature hashed to (possible only when scoring docs
    # outside `raw`): both counts are 0 -> the smoothed default
    default_ratio = F.lit(math.log(alpha / denom_t) - math.log(alpha / denom_r))

    feats = raw.select(
        F.col(id_col),
        F.explode(ngram_features_expr(F.col(text_col))).alias("__feat"),
    ).select(id_col, bucket_expr(F.col("__feat"), n_buckets).alias("bucket"))
    # n_buckets rows by construction -> broadcast-safe at any corpus size
    return (
        feats.join(F.broadcast(ratio), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_feats"),
            F.round(
                F.sum(F.coalesce(F.col("log_ratio"), default_ratio)), 4
            ).alias("log_weight"),
        )
    )


def importance_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    alpha: float = 1.0,
    temperature: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Gumbel-top-k importance resampling: k raw docs sampled without
    replacement with probability proportional to softmax(log_weight /
    temperature) — one deterministic rank, no sequential draws.

    score = log_weight / temperature + g, g = -ln(-ln u) with the
    deterministic per-doc uniform draw u from ``sampling.uniform_hash``
    (so the selected SET is identical across engines and runs; the oracle
    reproduces it exactly). Ranking is on the rounded score with id
    tie-break; the plan is TakeOrderedAndProject over the weight output —
    no global sort materializes.
    """
    w = importance_weights(raw, target, text_col, id_col, n_buckets, alpha)
    u = (uniform_hash(F.col(id_col), seed) + F.lit(0.5)) / F.lit(float(SCALE))
    gumbel = -F.log(-F.log(u))
    scored = w.select(
        id_col,
        "log_weight",
        F.round(F.col("log_weight") / F.lit(temperature) + gumbel, 4).alias(
            "gumbel_score"
        ),
    )
    return scored.orderBy(F.desc("gumbel_score"), F.col(id_col)).limit(k)
