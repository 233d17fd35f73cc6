"""Model-based quality filtering — a linear classifier over hashed token
unigrams, the fastText/CCNet/GPT-3 "quality classifier" stage re-expressed
Spark-first.

Public recipes (Wenzek et al. 2020 CCNet; Brown et al. 2020 §A) filter web
text with a LINEAR model scoring bag-of-(hashed-)ngrams against a trusted
reference corpus — far more selective than the heuristic gates in
ops/text.py, and the single highest-leverage curation op they report. The
two halves get different engines on purpose:

- **fit** (`fit_quality_classifier`): Catalyst ``hashed_bucket``
  featurization → pyspark.ml LogisticRegression over labeled docs. Training
  is distributed (MLlib's L-BFGS aggregates gradients tree-wise), runs
  rarely, and returns a plain ``{bucket: weight}`` dict + intercept — the
  MODEL LEAVES MLlib so the hot path never touches it. (MLlib's HashingTF
  is deliberately NOT used: its murmur variant differs from ``F.hash``, so
  featurizing with the scorer's own expression is what makes fit and score
  agree bucket-for-bucket.)
- **score** (`score_quality`): one Catalyst projection. Tokens hash with
  the identical ``hashed_bucket`` expression, weights arrive as a broadcast
  ``MapType`` literal (models are 10^4-10^5 buckets — kilobytes, a true
  broadcast, unlike the corpus-sized sets this repo refuses to broadcast),
  and the dot product is ``aggregate`` over the token array. Zero Python in
  the data plane, zero shuffle: at 100 TB this fuses into whatever scan the
  pipeline is already paying.

Scale note: ``num_buckets`` bounds the model, not the data; token arrays
never materialize corpus-wide state. The sigmoid threshold (keep if
P(quality) >= tau) composes with prep's other gates as one more fused
filter.

Reference analog: none (table2qb is a CSV converter) — north-rule training-
data surface, same family as ops/text.py's heuristic gates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(c: Column) -> Column:
    """Lowercased whitespace tokens — must match fit() and score()."""
    return F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != "")


def hashed_bucket(token: Column, num_buckets: int) -> Column:
    """A token's feature bucket: pmod(F.hash(token), n) — Catalyst's
    Murmur3, evaluated JVM-side in both the fit featurizer and the scorer.
    Deliberately NOT MLlib's HashingTF (its murmur variant differs from
    ``F.hash`` — hashUnsafeBytes2 vs hashUnsafeBytes): the fit path
    featurizes with THIS expression and hands MLlib pre-built vectors, so
    fit and score agree bucket-for-bucket by construction, not by
    hash-implementation coincidence."""
    return F.pmod(F.hash(token), F.lit(num_buckets))


def fit_quality_classifier(
    docs: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    num_buckets: int = 1 << 14,
    reg_param: float = 0.0,
    max_iter: int = 50,
) -> dict:
    """Fit the linear quality model. ``docs`` carries ``text_col`` and a
    0/1 ``label_col`` (1 = trusted/reference corpus, 0 = raw crawl).
    Returns {"weights": {bucket(int): coef(float)}, "intercept": float,
    "num_buckets": int} — a plain dict, serializable anywhere, consumed by
    ``score_quality`` without MLlib.

    Featurization runs as the SAME Catalyst ``hashed_bucket`` expression the
    scorer uses (JVM-side); only the sparse-vector assembly is per-row
    Python — acceptable on the fit path, which sees the labeled training
    set, not the corpus."""
    from collections import Counter

    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.linalg import Vectors, VectorUDT
    from pyspark.sql.types import DoubleType, StructField, StructType

    bucketed = docs.select(
        F.col(label_col).cast("double").alias("label"),
        F.transform(
            _tokens(F.col(text_col)), lambda t: hashed_bucket(t, num_buckets)
        ).alias("buckets"),
    )
    n = num_buckets
    feats = docs.sparkSession.createDataFrame(
        bucketed.rdd.map(
            lambda r: (
                r["label"],
                Vectors.sparse(n, sorted(Counter(r["buckets"]).items())),
            )
        ),
        StructType(
            [
                StructField("label", DoubleType(), False),
                StructField("features", VectorUDT(), False),
            ]
        ),
    )
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg_param, standardization=False
    )
    model = lr.fit(feats)
    coefs = model.coefficients
    # sparse when regularized, dense otherwise — keep only non-zeros either
    # way (the broadcast map should be model-sized, not num_buckets-sized)
    weights = {
        int(i): float(v)
        for i, v in zip(range(len(coefs)), coefs.toArray())
        if v != 0.0
    }
    return {
        "weights": weights,
        "intercept": float(model.intercept),
        "num_buckets": num_buckets,
    }


def quality_prob_expr(text: Column, model: dict) -> Column:
    """P(quality) for one document as a single Catalyst expression:
    sigmoid(intercept + sum over tokens of weight[bucket(token)]).
    Weights enter as a MapType literal (broadcast with the plan — model-
    sized, kilobytes); unseen buckets contribute 0 via try_element_at.

    ``num_buckets=None`` switches to a WORD-keyed model (weights keyed by
    the literal token instead of its hash bucket) — interpretable lexicon
    scoring, and the form an engine-independent oracle can replicate."""
    n = model.get("num_buckets")
    if n is None:
        weights = {str(k): float(v) for k, v in model["weights"].items()}
        key_of = lambda t: t  # noqa: E731
        ks: list = sorted(weights)
    else:
        # JSON round-trips stringify map keys — normalize before building
        weights = {int(k): float(v) for k, v in model["weights"].items()}
        key_of = lambda t: hashed_bucket(t, n)  # noqa: E731
        ks = sorted(weights)
    if weights:
        # two array LITERALS, not a 2N-child create_map: the expression tree
        # stays tiny at 10^4+ buckets and ConstantFolding collapses the map
        # once at plan time
        wmap = F.map_from_arrays(
            F.lit(ks), F.lit([weights[k] for k in ks])
        )
        per_token = lambda t: F.coalesce(  # noqa: E731
            F.try_element_at(wmap, key_of(t)), F.lit(0.0)
        )
    else:
        per_token = lambda t: F.lit(0.0)  # noqa: E731
    z = F.aggregate(
        _tokens(text),
        F.lit(float(model["intercept"])),
        lambda acc, t: acc + per_token(t),
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def score_quality(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    keep_threshold: float | None = None,
) -> DataFrame:
    """Add ``quality_prob``; with ``keep_threshold`` also filter to docs at
    or above it (the CCNet/GPT-3 keep rule). One fused projection+filter —
    no shuffle, no Python."""
    out = df.withColumn(
        "quality_prob", quality_prob_expr(F.col(text_col), model)
    )
    if keep_threshold is not None:
        out = out.where(F.col("quality_prob") >= keep_threshold)
    return out
