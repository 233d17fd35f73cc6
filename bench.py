"""Benchmark harness (driver-run per round -> BENCH_r{N}.json).

Headline: CDC replay throughput — synthesize a deterministic skewed change
log sized to the SF, replay it through the lake MERGE engine to converged
final state, report change-events/sec (the BASELINE.json metric). Plus wall
time for the headline analytical queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "cdc_replay": {events, seconds, events_per_sec, ...}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

# headline analytical queries (subset of the full 48 — the expensive shapes;
# dedup_simhash_pairs is in to keep the hash-once signature win measured)
BENCH_QUERIES = [
    "cube_observations",
    "observation_uri",
    "used_codes",
    "cdc_latest_state",
    "cdc_merge_upsert",
    "cdc_patch_state",
    "cdc_sessionize",
    "text_analysis",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "semantic_dedup",
    "ann_cosine_topk",
    "url_dedup",
    "quality_classifier",
    "pricing_summary",
]


def sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.0


N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def _tmpfs_base() -> str | None:
    """tmpfs base for the bench workdir + spark.local.dir, when present.

    BENCH.md's methodology line ("shuffle dirs on tmpfs") was previously
    aspirational: tempfile.mkdtemp put the generated log, the lakes, AND
    Spark's shuffle spill on the VM disk, so run-to-run replay numbers
    tracked disk and page-cache state rather than the engine (measured on
    one host: same commit, 273k vs 123k ev/s purely across windows; a
    direct-IO dd showed the disk at ~340 MB/s while the replay's bucket
    write wants multiples of that). A memory-bandwidth benchmark should
    not time a virtual disk — pin scratch to tmpfs whenever it has
    comfortable headroom (sf0.1 scratch is <2 GiB; guard at 24 GiB so a
    sf1 run still fits), fall back to the default tempdir otherwise.
    """
    base = "/dev/shm"
    try:
        st = os.statvfs(base)
        if st.f_bavail * st.f_frsize >= 24 << 30 and os.access(base, os.W_OK):
            return base
    except OSError:
        pass
    return None


def run_cdc_replay(spark, sf: float, workdir: str, n_runs: int = 2) -> dict:
    """Replay a synthetic change log sized ~20M events/sf unit (sf0.1 -> 2M)
    into a fresh lake table; report converged events/sec.

    Min-of-``n_runs`` (fresh table each run, same generated log): single-shot
    replay timings on this time-shared host swing +-20% and the first run
    pays whole-stage-codegen JIT warmup — one run cannot distinguish a 10%
    regression from noise (round-3 verdict #3)."""
    from table2qb_spark.cdc.apply import ChangeLogReplayer
    from table2qb_spark.datagen import changelog as gen
    from table2qb_spark.lake.table import LakeTable

    n_events = max(200_000, int(20_000_000 * sf))
    n_repos = max(64, n_events // 1000)
    paths_per_repo = 500
    events_path = os.path.join(workdir, "events")

    t0 = time.time()
    ev = gen.gen_change_log(
        spark, n_events, n_repos, paths_per_repo, seed=42,
        n_partitions=CPUS * 2,
    )
    gen.write_change_log(ev, events_path, n_files=CPUS * 2)
    gen_sec = time.time() - t0

    best = None
    for i in range(n_runs):
        lake_dir = os.path.join(workdir, f"lake{i}")
        table = LakeTable.create(
            spark,
            lake_dir,
            [("repo", "string"), ("path", "string"), ("commit", "string"),
             ("lang", "string"), ("content", "string"), ("content_sha", "string")],
            ["repo", "path"],
            n_buckets=256,  # fine buckets: short straggler tails, pruned rewrites
        )
        # two micro-batches: still exercises incremental MERGE + checkpointing,
        # while amortizing the ~5s per-batch fixed cost (at production scale a
        # micro-batch is 10^8 events, so fixed cost vanishes; see BENCH.md)
        replayer = ChangeLogReplayer(
            spark, table, events_path, batch_events=max(1_000_000, n_events // 2)
        )
        t1 = time.time()
        results = replayer.run()
        replay_sec = time.time() - t1
        run = {
            "events": n_events,
            "gen_seconds": round(gen_sec, 2),
            "seconds": round(replay_sec, 2),
            "events_per_sec": round(n_events / replay_sec, 1),
            "batches": len(results),
            "final_rows": table.row_count(),
            "n_buckets": table.snapshot().n_buckets,
        }
        if best is None or run["seconds"] < best["seconds"]:
            best = run
        if i < n_runs - 1:
            shutil.rmtree(lake_dir, ignore_errors=True)
    best["runs"] = n_runs
    return best


def run_stream_replay(spark, events_path: str, n_events: int, workdir: str) -> dict:
    """availableNow Structured Streaming over the SAME change log (vs the
    batch replayer): arrival-defined micro-batches through foreachBatch into
    a seq-guarded tombstone table — the steady-state ingest path. Measures
    the foreachBatch + per-micro-batch commit overhead relative to batch
    replay (VERDICT r2 #10)."""
    from table2qb_spark.cdc.streaming import create_stream_table, run_stream_to_completion

    table = create_stream_table(
        spark,
        os.path.join(workdir, "stream_lake"),
        [("repo", "string"), ("path", "string"), ("commit", "string"),
         ("lang", "string"), ("content", "string"), ("content_sha", "string")],
        ["repo", "path"],
        n_buckets=256,
    )
    t0 = time.time()
    run_stream_to_completion(
        spark, table, events_path, os.path.join(workdir, "stream_ckpt"),
        # event-sized triggers (~10^6 events each): per-micro-batch fixed
        # cost is the stream/batch gap, so match the batch replayer's
        # batch granularity instead of arrival-defined file counts
        max_files_per_trigger="auto",
    )
    sec = time.time() - t0
    return {
        "events": n_events,
        "seconds": round(sec, 2),
        "events_per_sec": round(n_events / sec, 1),
        # live rows (tombstones excluded) — comparable to the batch replay's
        # final_rows, which deletes physically
        "final_rows": table.read_live().count(),
    }


def main():
    from table2qb_spark.entry_queries import QUERIES
    from table2qb_spark.session import get_spark

    workdir = tempfile.mkdtemp(prefix="bench_cdc_", dir=_tmpfs_base())
    # shuffle spill next to the lake scratch (tmpfs when available) — the
    # session honors SPARK_GRAFT_LOCAL_DIR; an explicit user setting wins
    os.environ.setdefault(
        "SPARK_GRAFT_LOCAL_DIR", os.path.join(workdir, "spark_local")
    )
    spark = get_spark(
        app_name="table2qb_spark-bench",
        master=f"local[{CPUS}]",
        # fine-grained shuffle partitioning + AQE coalesce: short task tails
        shuffle_partitions=max(128, CPUS * 4),
    )
    sf = sf_of(SF_DIR)

    try:
        cdc = run_cdc_replay(spark, sf, workdir)

        # queries BEFORE the stream replay (round-3 verdict #3: interposing
        # the stream run before the query suite confounded r03-vs-r02
        # comparisons), min-of-N each against host noise + JIT warmup
        queries = {}
        query_medians = {}
        total = cdc["seconds"]
        for name in BENCH_QUERIES:
            times = []
            for _ in range(N_RUNS):
                t0 = time.time()
                df = QUERIES[name](spark, SF_DIR)
                # noop sink: materializes EVERY output column (a bare
                # .count() lets Catalyst prune projections and time only
                # the scan)
                df.write.format("noop").mode("overwrite").save()
                times.append(time.time() - t0)
            times.sort()
            # min stays the headline (JIT/host-noise floor, round-3 #3);
            # median exposes the run-to-run variance (round-4 task #9)
            queries[name] = round(times[0], 3)
            query_medians[name] = round(times[len(times) // 2], 3)
            total += times[0]

        # same log through the Structured Streaming front-end (separate
        # figure; NOT added to the headline total — it re-ingests the same
        # events and would double-count them)
        stream = run_stream_replay(
            spark, os.path.join(workdir, "events"), cdc["events"], workdir
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    out = {
        "metric": "cdc replay to converged lake state + headline query suite",
        "value": round(total, 2),
        "unit": "sec",
        "queries": queries,
        "query_medians": query_medians,
        "sf": sf,
        "cpus": CPUS,
        "cdc_replay": cdc,
        "events_per_sec": cdc["events_per_sec"],
        "stream_replay": stream,
        "stream_events_per_sec": stream["events_per_sec"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
