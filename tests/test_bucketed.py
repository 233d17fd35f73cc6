"""Shuffle-free bucketed replay: equivalence with the shuffle merge and the
Python oracle; exactly-once resume; no-exchange plan audit."""

import pytest
from pyspark.sql import functions as F

from table2qb_spark.cdc.apply import ChangeLogReplayer
from table2qb_spark.cdc.bucketed import BucketedReplayer, write_bucketed_change_log
from table2qb_spark.cdc.verify import table_sha256
from table2qb_spark.datagen import changelog as gen
from table2qb_spark.lake.table import LakeTable

BASE_SCHEMA = [
    ("repo", "string"),
    ("path", "string"),
    ("commit", "string"),
    ("lang", "string"),
    ("content", "string"),
]
KEYS = ["repo", "path"]
COLS = [c for c, _ in BASE_SCHEMA]
N_BUCKETS = 4


@pytest.fixture(scope="module")
def logs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    ev = gen.gen_change_log(
        spark, 2500, 10, 40, seed=5, dup_rate=0.04, schema_evolution_after=None
    )
    flat = str(root / "flat")
    bucketed = str(root / "bucketed")
    gen.write_change_log(ev, flat, n_files=6)
    write_bucketed_change_log(ev, bucketed, KEYS, N_BUCKETS)
    return flat, bucketed, root


def test_bucketed_equals_shuffle_merge(spark, tmp_path, logs):
    flat, bucketed, _ = logs
    t_ref = LakeTable.create(spark, str(tmp_path / "ref"), BASE_SCHEMA, KEYS, n_buckets=N_BUCKETS)
    ChangeLogReplayer(spark, t_ref, flat, batch_events=800).run()
    want = table_sha256(t_ref.read(), COLS)

    t = LakeTable.create(spark, str(tmp_path / "bkt"), BASE_SCHEMA, KEYS, n_buckets=N_BUCKETS)
    res = BucketedReplayer(spark, t, bucketed, batch_events=800).run()
    assert all(not r.get("skipped") for r in res)
    assert table_sha256(t.read(), COLS) == want


def test_bucketed_resume_and_idempotency(spark, tmp_path, logs):
    _, bucketed, _ = logs
    t = LakeTable.create(spark, str(tmp_path / "b2"), BASE_SCHEMA, KEYS, n_buckets=N_BUCKETS)
    r = BucketedReplayer(spark, t, bucketed, batch_events=800)
    r.run(max_batches=1)
    r2 = BucketedReplayer(spark, t, bucketed, batch_events=800)
    assert r2.last_applied_batch() == 0
    r2.run()
    sha = table_sha256(t.read(), COLS)
    res = BucketedReplayer(spark, t, bucketed, batch_events=800).run()
    assert res == []
    assert table_sha256(t.read(), COLS) == sha


def test_bucketed_plan_has_no_exchange(spark, tmp_path, logs):
    """THE point of the bucketed path: zero shuffle in the merge plan."""
    _, bucketed, _ = logs
    t = LakeTable.create(spark, str(tmp_path / "b3"), BASE_SCHEMA, KEYS, n_buckets=N_BUCKETS)
    r = BucketedReplayer(spark, t, bucketed, batch_events=10_000)
    # reconstruct the merge DataFrame exactly as apply_range builds it, and
    # check its physical plan
    import table2qb_spark.cdc.bucketed as B
    from functools import reduce

    snap = t.snapshot()
    children = []
    for b in r._event_buckets:
        ev = (
            spark.read.schema(r._events_schema)
            .parquet(f"{bucketed}/b={b}")
            .select(
                *KEYS,
                F.col("seq").cast("long").alias("__seq"),
                F.col("op").alias("__op"),
                *[F.col(c) for c in COLS if c not in KEYS],
            )
        )
        children.append(ev.coalesce(1).withColumn("__bucket", F.lit(b)))
    unioned = reduce(lambda a, c: a.unionByName(c), children)
    plan = unioned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
