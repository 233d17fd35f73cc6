"""A/B microbench for the model-based quality classifier's scoring path
(ops/classifier.py): measures docs/sec of the Catalyst map-literal scorer at
three model sizes against the heuristic quality_score_expr baseline, plus a
row-at-a-time Python-UDF strawman of the same model — quantifying the
"zero Python on the hot path" claim.

Usage: python tools/ab_classifier.py [sf_dir]   (default /root/testdata/sf0.1)
Prints one JSON line: seconds per variant (min of N runs) + docs/sec.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from table2qb_spark.ops.classifier import quality_prob_expr
from table2qb_spark.ops.text import quality_score_expr
from table2qb_spark.session import get_spark

RUNS = 3


def time_df(df) -> float:
    best = None
    for _ in range(RUNS):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def model_of(size: int, n_buckets: int = 1 << 16) -> dict:
    # deterministic synthetic weights (no RNG: reproducible bench)
    return {
        "weights": {
            (i * 2654435761) % n_buckets: ((i % 17) - 8) / 16.0
            for i in range(size)
        },
        "intercept": 0.0625,
        "num_buckets": n_buckets,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ab-classifier")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    docs = docs.select("doc_id", "text").cache()
    docs.count()  # materialize the cache outside the timings

    out: dict = {"sf_dir": sf_dir, "docs": n_docs, "runs": RUNS}
    for size in (1000, 10_000, 50_000):
        m = model_of(size)
        secs = time_df(
            docs.select(quality_prob_expr(F.col("text"), m).alias("p"))
        )
        out[f"catalyst_{size}w_sec"] = round(secs, 3)
        out[f"catalyst_{size}w_docs_per_sec"] = round(n_docs / secs, 1)

    # heuristic baseline (ops/text.py) — the gate the model scorer augments
    secs = time_df(docs.select(quality_score_expr(F.col("text")).alias("p")))
    out["heuristic_sec"] = round(secs, 3)

    # row-at-a-time Python UDF strawman of the 10k model: what the scorer
    # would cost done the "obvious" way
    m = model_of(10_000)
    w, b, n = m["weights"], m["intercept"], m["num_buckets"]

    def py_score(text: str) -> float:
        z = b
        for t in (text or "").lower().split():
            # python hash() differs from F.hash — irrelevant for timing
            z += w.get(hash(t) % n, 0.0)
        return 1.0 / (1.0 + math.exp(-z))

    udf = F.udf(py_score, DoubleType())
    secs = time_df(docs.select(udf("text").alias("p")))
    out["python_udf_10kw_sec"] = round(secs, 3)
    out["catalyst_vs_python_udf_speedup"] = round(
        secs / out["catalyst_10000w_sec"], 1
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
