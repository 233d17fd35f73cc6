"""A/B microbench for incremental materialized-view refresh vs full
recompute — the O(changes) vs O(table) claim in lake/materialize.py,
measured.

Scenario: a populated source table (BASE_ROWS keys) gets K small change
batches (update-heavy, scattered). After EACH batch, two contenders
produce the same aggregate (docs + bytes by lang):

- `refresh_view` — one coalesced envelope diff since the view's cursor,
  per-group delta, state merge (the incremental path);
- a from-scratch `full_aggregate` scan of the source's current snapshot
  materialized to parquet (what a report job without IVM pays).

Every round asserts digest equality between the view state and the
recompute (order-independent per-row sha). Prints one JSON line with
per-round seconds and the total speedup.

HONEST FINDING (measured 2026-08-19, 1M base rows / 20k scattered
changes / 32 buckets): the diff-based refresh LOSES to recompute at this
scale (speedup 0.14x). The delta read is the bucket-pruned snapshot
diff, so refresh cost is O(touched-bucket bytes), not O(changed rows) —
and 20k UNIFORMLY SCATTERED keys touch all 32 buckets, making the diff
read ~2x the table (both snapshot versions) plus join overhead, while
recompute reads it once. Diff-based IVM wins only when changes are
localized relative to the bucket count or the aggregate join dominates.
The true O(changes) path is a persisted change feed written AT MERGE
TIME (the merge join already holds before/after images) — see
lake/cdf.py; pass --cdf to measure that path, which is what the
materialize docstring's O(changes) claim rests on at 100 TB.

Usage: python tools/ab_materialize.py [base_rows] [batch_events]
[n_batches] [n_buckets] [--cdf]; defaults 1_000_000 / 20_000 / 5 / 32.
``--cdf`` creates the source with change-feed capture on, so the refresh
reads O(changes) feeds instead of diffing snapshots; the JSON then also
reports the capture overhead paid at merge time (merge_secs vs the
non-CDF run's).
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

from table2qb_spark.cdc.verify import table_sha256
from table2qb_spark.datagen.changelog import gen_change_log
from table2qb_spark.lake.materialize import (
    create_view,
    full_aggregate,
    parse_aggs,
    refresh_view,
)
from table2qb_spark.lake.merge import merge_upsert
from table2qb_spark.lake.table import LakeTable
from table2qb_spark.session import get_spark

SCHEMA = [
    ("repo", "string"),
    ("path", "string"),
    ("commit", "string"),
    ("lang", "string"),
    ("content", "string"),
]
GROUP = ["lang"]
AGG_SPECS = ["docs=count(*)", "bytes=sum(length(content))"]


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--cdf"]
    use_cdf = "--cdf" in sys.argv[1:]
    base_rows = int(argv[0]) if len(argv) > 0 else 1_000_000
    batch_events = int(argv[1]) if len(argv) > 1 else 20_000
    n_batches = int(argv[2]) if len(argv) > 2 else 5
    n_buckets = int(argv[3]) if len(argv) > 3 else 32
    spark = get_spark("ab-materialize")

    work = tempfile.mkdtemp(prefix="ab_mv_", dir="/dev/shm")
    try:
        n_repos, paths = 200, max(50, base_rows // 200 // 2)
        base = gen_change_log(
            spark, base_rows, n_repos, paths, insert_rate=1.0,
            delete_rate=0.0, dup_rate=0.0, schema_evolution_after=None,
        ).cache()
        base.count()
        inc_total = batch_events * n_batches
        inc = (
            gen_change_log(
                spark, inc_total, n_repos, paths, insert_rate=0.1,
                delete_rate=0.1, dup_rate=0.0, schema_evolution_after=None,
            )
            .withColumn("seq", F.col("seq") + base_rows)
            .cache()
        )
        inc.count()

        tdir = os.path.join(work, "src")
        t = LakeTable.create(
            spark, tdir, SCHEMA, ["repo", "path"], n_buckets=n_buckets,
            properties={"cdf.enabled": "true"} if use_cdf else None,
        )
        merge_upsert(t, base, "base", batch_size_hint=base_rows)

        vdir = os.path.join(work, "mv")
        t0 = time.time()
        create_view(spark, tdir, vdir, GROUP, AGG_SPECS)
        bootstrap_sec = round(time.time() - t0, 3)
        view = LakeTable(spark, vdir)
        aggs = parse_aggs(AGG_SPECS)
        view_cols = [c["name"] for c in view.snapshot().current_schema()]

        refresh_secs, recompute_secs, merge_secs = [], [], []
        for i in range(n_batches):
            b = inc.where(
                (F.col("seq") > base_rows + i * batch_events)
                & (F.col("seq") <= base_rows + (i + 1) * batch_events)
            )
            t0 = time.time()
            merge_upsert(t, b, f"inc{i}", batch_size_hint=batch_events)
            merge_secs.append(round(time.time() - t0, 3))

            t0 = time.time()
            refresh_view(spark, vdir)
            refresh_secs.append(round(time.time() - t0, 3))

            out = os.path.join(work, f"recompute{i}")
            t0 = time.time()
            full_aggregate(t.read(), GROUP, aggs).write.mode(
                "overwrite").parquet(out)
            recompute_secs.append(round(time.time() - t0, 3))

            got = table_sha256(view.read().select(*view_cols))
            want = table_sha256(
                spark.read.parquet(out).select(*view_cols)
            )
            assert got == want, f"round {i}: view != recompute"

        results = {
            "base_rows": base_rows,
            "batch_events": batch_events,
            "n_batches": n_batches,
            "n_buckets": n_buckets,
            "cdf": use_cdf,
            "merge_secs": merge_secs,
            "bootstrap_sec": bootstrap_sec,
            "refresh_secs": refresh_secs,
            "recompute_secs": recompute_secs,
            "refresh_total_sec": round(sum(refresh_secs), 3),
            "recompute_total_sec": round(sum(recompute_secs), 3),
            "digest_match": True,
            "speedup_incremental": round(
                sum(recompute_secs) / max(1e-9, sum(refresh_secs)), 2
            ),
        }
        print(json.dumps(results))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
