"""A/B microbench for sorted compaction + file-level data skipping:
quantifies what `cdc-compact --sort-by _seq --max-records-per-file N` buys
an incremental tail read (`read(where="_seq>=X")`) over the same table
compacted WITHOUT clustering.

Layout under test (same row count, same content, same bucket count):

- **baseline**: default compaction — one unsorted file per bucket; a
  `_seq >= X` predicate admits EVERY file (each spans the full seq range),
  so the read scans the whole table and filters.
- **sorted**: sorted compaction — each bucket split into several files
  with disjoint `_seq` ranges; the manifest min/max stats prune all files
  below the cutoff at PLAN time (never listed/opened by Spark).

Usage: python tools/ab_skipping.py [n_rows] [n_buckets] [files_per_bucket]
Defaults: 2_000_000 rows, 16 buckets, 8 files/bucket, tail = top 5% of seq.
Prints one JSON line: per-variant min-of-N seconds for the tail read,
files kept/total from the prune report, and the speedup.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from table2qb_spark.lake.compact import compact
from table2qb_spark.lake.merge import merge_upsert
from table2qb_spark.lake.table import LakeTable
from table2qb_spark.session import get_spark

RUNS = 3


def build(spark, path: str, n_rows: int, n_buckets: int) -> LakeTable:
    from table2qb_spark.cdc.streaming import create_stream_table

    t = create_stream_table(
        spark, path,
        [("repo", "string"), ("path", "string"), ("content", "string")],
        ["repo", "path"], n_buckets=n_buckets,
    )
    # unique keys, seq scattered relative to key hash so an unsorted bucket
    # file spans (almost) the full seq range
    batch = (
        spark.range(n_rows)
        .select(
            (F.col("id") + 1).alias("seq"),
            F.lit("I").alias("op"),
            F.concat(F.lit("org/repo-"), (F.col("id") % 997).cast("string")).alias("repo"),
            F.concat(F.lit("src/f"), F.col("id").cast("string"), F.lit(".py")).alias("path"),
            F.sha2(F.col("id").cast("string"), 256).alias("content"),
        )
    )
    merge_upsert(t, batch, "b1", batch_size_hint=1)
    return t


def time_tail_read(t: LakeTable, cutoff: int) -> tuple[float, dict]:
    best = None
    report: dict = {}
    for _ in range(RUNS):
        report = {}
        df = t.read(where=f"_seq>={cutoff}", prune_report=report)
        t0 = time.time()
        df.agg(F.count("*"), F.sum(F.length("content"))).collect()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, report


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    files_per_bucket = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    cutoff = int(n_rows * 0.95)
    base = tempfile.mkdtemp(prefix="ab_skip_", dir="/dev/shm")
    spark = get_spark("ab-skipping")
    try:
        out = {"n_rows": n_rows, "n_buckets": n_buckets,
               "files_per_bucket": files_per_bucket, "cutoff": cutoff}
        for variant in ("baseline", "sorted"):
            t = build(spark, os.path.join(base, variant), n_rows, n_buckets)
            if variant == "sorted":
                per_file = max(1, n_rows // (n_buckets * files_per_bucket))
                compact(t, sort_by=["_seq"], max_records_per_file=per_file)
            else:
                compact(t, min_files=1)
            # warm the page cache identically before timing
            t.read().agg(F.count("*")).collect()
            secs, report = time_tail_read(t, cutoff)
            out[variant] = {"seconds": round(secs, 3), **report}
        out["speedup"] = round(out["baseline"]["seconds"] / out["sorted"]["seconds"], 2)
        print(json.dumps(out))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
