"""A/B microbench for the hash-once signature rewrites (round-4 verdict #2
and its minhash sibling): times the OLD round-4 expression shapes — md5
re-evaluated inside every per-bit/per-permutation aggregate — against the
shipped hash-once forms, on the sf documents table.

Usage: python tools/ab_signatures.py [sf_dir]   (default /root/testdata/sf0.1)
Prints one JSON line: seconds per variant (min of N runs) + speedups.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from table2qb_spark.ops.dedup import (
    minhash_coeffs,
    minhash_signature,
    shingles_expr,
    simhash_from_hashes,
    token_hashes_expr,
)
from table2qb_spark.ops.text import tokens_expr
from table2qb_spark.session import get_spark

RUNS = 3


def time_df(df) -> float:
    best = None
    for _ in range(RUNS):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def old_simhash_expr(c, bits=60):
    """Round-4 shape: each of the `bits` per-bit votes folds over the TOKEN
    array and re-computes md5 inside its own lambda (no CSE across
    higher-order-function lambdas => md5 evaluated `bits` times/token)."""
    toks = F.array_distinct(tokens_expr(c))

    def token_hash(t):
        return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")

    def vote_fn(j):
        def fn(acc, t):
            bit = F.shiftright(token_hash(t), j).bitwiseAND(F.lit(1))
            return acc + F.when(bit == 1, F.lit(1)).otherwise(F.lit(-1))

        return fn

    sig = F.lit(0).cast("long")
    for j in range(bits):
        votes = F.aggregate(toks, F.lit(0).cast("long"), vote_fn(j))
        sig = sig + F.when(votes > 0, F.lit(2**j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def old_minhash(df, k=8, n=3):
    """Round-4 shape: K min-aggregates each evaluating md5(i||'|'||shingle)
    per shingle occurrence."""
    sh = df.select(F.col("doc_id"), F.explode(shingles_expr(F.col("text"), n)).alias("sh"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("sh")))).alias(f"mh{i}")
        for i in range(k)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ab-signatures")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    docs.write.format("noop").mode("overwrite").save()  # warm page cache / JIT

    new_sim = docs.select(
        "doc_id", token_hashes_expr(F.col("text")).alias("__th")
    ).select("doc_id", simhash_from_hashes(F.col("__th")).alias("sig"))
    old_sim = docs.select("doc_id", old_simhash_expr(F.col("text")).alias("sig"))

    out = {
        "sf_dir": sf_dir,
        "runs": RUNS,
        "simhash_new_s": time_df(new_sim),
        "simhash_old_s": time_df(old_sim),
        "minhash_new_s": time_df(minhash_signature(docs, "text", "doc_id")),
        "minhash_old_s": time_df(old_minhash(docs)),
        "coeffs": len(minhash_coeffs(8)),
    }
    out["simhash_speedup"] = round(out["simhash_old_s"] / out["simhash_new_s"], 2)
    out["minhash_speedup"] = round(out["minhash_old_s"] / out["minhash_new_s"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
