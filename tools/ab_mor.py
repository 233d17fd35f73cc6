"""A/B microbench for merge-on-read vs copy-on-write on the update-heavy
steady state — the write-amplification case MOR exists for.

Scenario: a populated seq-guarded table (BASE_ROWS keys across N_BUCKETS
buckets) receives K small incremental batches of scattered updates (each
touching every bucket — the worst case for bucket-granularity COW, and the
common case for a power-law CDC stream at 100 TB where every bucket has a
hot repo). Measured per variant:

- apply seconds per batch (min + total across batches)
- bytes written under data/ by the incremental batches (the amplification)
- full-scan read seconds AFTER the batches (MOR pays the mask join)
- read seconds after cdc-compact (MOR's debt folded away)

Both variants must converge to the identical digest (asserted). Prints one
JSON line. Usage: python tools/ab_mor.py [base_rows] [batch_events]
[n_batches] [n_buckets]; defaults 1_000_000 / 20_000 / 5 / 32.
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

from table2qb_spark.cdc.streaming import create_stream_table
from table2qb_spark.cdc.verify import table_sha256
from table2qb_spark.datagen.changelog import gen_change_log
from table2qb_spark.lake.compact import compact
from table2qb_spark.lake.merge import merge_upsert
from table2qb_spark.lake.mor import merge_mor
from table2qb_spark.lake.table import LakeTable
from table2qb_spark.session import get_spark

SCHEMA = [
    ("repo", "string"),
    ("path", "string"),
    ("commit", "string"),
    ("lang", "string"),
    ("content", "string"),
]


def dir_bytes(root: str) -> int:
    total = 0
    for dp, _dn, fns in os.walk(root):
        for fn in fns:
            total += os.path.getsize(os.path.join(dp, fn))
    return total


def main() -> None:
    base_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    batch_events = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    n_buckets = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    spark = get_spark("ab-mor")

    work = tempfile.mkdtemp(prefix="ab_mor_", dir="/dev/shm")
    try:
        # one event stream: base load (seqs 1..base_rows, inserts-heavy)
        # then n_batches update-only increments over the SAME key space
        n_repos, paths = 200, max(50, base_rows // 200 // 2)
        base = gen_change_log(
            spark, base_rows, n_repos, paths, insert_rate=1.0,
            delete_rate=0.0, dup_rate=0.0, schema_evolution_after=None,
        ).cache()
        base.count()
        inc_total = batch_events * n_batches
        inc = (
            gen_change_log(
                spark, inc_total, n_repos, paths, insert_rate=0.0,
                delete_rate=0.05, dup_rate=0.0, schema_evolution_after=None,
            )
            .withColumn("seq", F.col("seq") + base_rows)
            .cache()
        )
        inc.count()

        results: dict = {
            "base_rows": base_rows,
            "batch_events": batch_events,
            "n_batches": n_batches,
            "n_buckets": n_buckets,
        }
        digests = {}
        for variant in ("cow", "mor"):
            tdir = os.path.join(work, variant)
            t = create_stream_table(spark, tdir, SCHEMA, ["repo", "path"], n_buckets)
            merge_upsert(t, base, "base", batch_size_hint=base_rows)
            compact(t, min_files=1)  # identical clean starting layout
            data_dir = os.path.join(tdir, "data")
            bytes_before = dir_bytes(data_dir)
            apply_secs = []
            for i in range(n_batches):
                b = inc.where(
                    (F.col("seq") > base_rows + i * batch_events)
                    & (F.col("seq") <= base_rows + (i + 1) * batch_events)
                )
                t0 = time.time()
                if variant == "mor":
                    merge_mor(t, b, f"inc{i}")
                else:
                    merge_upsert(t, b, f"inc{i}", batch_size_hint=batch_events)
                apply_secs.append(round(time.time() - t0, 3))
            inc_bytes = dir_bytes(data_dir) - bytes_before
            t0 = time.time()
            n_live = t.read_live().count()
            read_sec = round(time.time() - t0, 3)
            digests[variant] = table_sha256(t.read_live())
            t0 = time.time()
            compact(t, min_files=1)
            compact_sec = round(time.time() - t0, 3)
            t0 = time.time()
            t.read_live().count()
            read_after_compact = round(time.time() - t0, 3)
            results[variant] = {
                "apply_secs": apply_secs,
                "apply_total_sec": round(sum(apply_secs), 3),
                "inc_bytes_written": inc_bytes,
                "read_sec": read_sec,
                "rows_live": n_live,
                "compact_sec": compact_sec,
                "read_after_compact_sec": read_after_compact,
            }
        assert digests["cow"] == digests["mor"], digests
        results["digest_match"] = True
        results["write_amplification_cow_over_mor"] = round(
            results["cow"]["inc_bytes_written"]
            / max(1, results["mor"]["inc_bytes_written"]),
            2,
        )
        results["apply_speedup_mor"] = round(
            results["cow"]["apply_total_sec"]
            / max(1e-9, results["mor"]["apply_total_sec"]),
            2,
        )
        print(json.dumps(results))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
