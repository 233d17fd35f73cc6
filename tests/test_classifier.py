"""Model-based quality classifier (ops/classifier.py): MLlib-fit linear
model, Catalyst-scored — the fastText/CCNet quality-filter stage.

The load-bearing claim is BUCKET AGREEMENT between fit and score: the fit
path featurizes with the scorer's own Catalyst ``hashed_bucket`` expression
(NOT MLlib's HashingTF, whose murmur variant differs from ``F.hash``), so
the Catalyst scorer must reproduce MLlib's transform probabilities exactly
on the same model — tested end-to-end on separable data.
"""
import math

import pytest
from pyspark.sql import functions as F

from table2qb_spark.ops.classifier import (
    fit_quality_classifier,
    hashed_bucket,
    quality_prob_expr,
    score_quality,
)

GOOD_WORDS = ["clean", "prose", "article", "measured", "sentence"]
JUNK_WORDS = ["buy", "click", "winner", "free", "pills"]


def _docs(spark, n=60):
    rows = []
    for i in range(n):
        if i % 2 == 0:
            text = " ".join(GOOD_WORDS[j % 5] for j in range(i % 7 + 3))
            rows.append((i, text, 1))
        else:
            text = " ".join(JUNK_WORDS[j % 5] for j in range(i % 7 + 3))
            rows.append((i, text, 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


class TestFitAndScore:
    def test_catalyst_scorer_matches_mllib_probabilities(self, spark, tmp_path):
        """Fit through raw MLlib on the SAME featurization the fit path
        uses, lift THAT model's coefficients into the scorer's dict shape,
        and require the Catalyst scorer to reproduce MLlib's own transform
        probabilities doc-for-doc. (One fit, two scorers — comparing two
        independent regParam=0 fits is flaky: on separable data LBFGS's
        stopping point depends on partition/aggregation order.)"""
        from collections import Counter

        from pyspark.ml.classification import LogisticRegression
        from pyspark.ml.linalg import Vectors, VectorUDT
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StructField,
            StructType,
        )

        docs = _docs(spark)
        n = 1 << 10

        bucketed = docs.select(
            "doc_id",
            F.col("label").cast("double").alias("label"),
            F.transform(
                F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != ""),
                lambda t: hashed_bucket(t, n),
            ).alias("buckets"),
        )
        feats = spark.createDataFrame(
            bucketed.rdd.map(
                lambda r: (
                    r["doc_id"], r["label"],
                    Vectors.sparse(n, sorted(Counter(r["buckets"]).items())),
                )
            ),
            StructType([
                StructField("doc_id", LongType(), False),
                StructField("label", DoubleType(), False),
                StructField("features", VectorUDT(), False),
            ]),
        )
        lr = LogisticRegression(maxIter=50, regParam=0.0, standardization=False)
        ml_model = lr.fit(feats)
        # Spark 4.1 landmine: fit() attaches a trainingSummary that holds the
        # SparkSession, and transform()'s prediction-UDF closure serializes
        # the whole model — session included. SparkSession.observationManager
        # is a lazy val materialized by any earlier pyspark.sql.Observation
        # use (lake/merge.py batch stats in a shared test session) and is not
        # java-Serializable, so transform() then dies with Task-not-
        # serializable. A save/load round-trip drops the summary, keeping the
        # model closure session-free regardless of test order.
        from pyspark.ml.classification import LogisticRegressionModel

        mpath = str(tmp_path / "lrm")
        ml_model.write().overwrite().save(mpath)
        ml_model = LogisticRegressionModel.load(mpath)
        expected = {
            r["doc_id"]: float(r["probability"][1])
            for r in ml_model.transform(feats).collect()
        }
        coefs = ml_model.coefficients.toArray()
        model = {
            "weights": {i: float(c) for i, c in enumerate(coefs) if c != 0.0},
            "intercept": float(ml_model.intercept),
            "num_buckets": n,
        }
        got = {
            r["doc_id"]: r["quality_prob"]
            for r in score_quality(docs, model).collect()
        }
        for d, p in expected.items():
            assert got[d] == pytest.approx(p, abs=1e-9), d

    def test_separation_and_threshold(self, spark):
        docs = _docs(spark)
        model = fit_quality_classifier(docs, num_buckets=1 << 10)
        held_out = spark.createDataFrame(
            [(1000, "clean measured prose"), (1001, "free pills click")],
            "doc_id long, text string",
        )
        scored = {r["doc_id"]: r["quality_prob"]
                  for r in score_quality(held_out, model).collect()}
        assert scored[1000] > 0.9 and scored[1001] < 0.1
        kept = score_quality(held_out, model, keep_threshold=0.5)
        assert [r["doc_id"] for r in kept.collect()] == [1000]

    def test_word_keyed_model_and_zero_shuffle(self, spark):
        model = {
            "weights": {"fast": 0.9, "slow": -0.9},
            "intercept": 0.1,
            "num_buckets": None,
        }
        df = spark.createDataFrame(
            [(1, "fast fast code"), (2, "slow slow slow")],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r["quality_prob"]
               for r in score_quality(df, model).collect()}
        sig = lambda z: 1.0 / (1.0 + math.exp(-z))  # noqa: E731
        assert got[1] == pytest.approx(sig(0.1 + 1.8), abs=1e-12)
        assert got[2] == pytest.approx(sig(0.1 - 2.7), abs=1e-12)
        plan = (
            score_quality(df, model, keep_threshold=0.5)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan  # pure fused projection+filter
