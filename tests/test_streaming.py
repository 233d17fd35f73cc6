"""Structured Streaming ingest: arrival-order-independent convergence via
seq-guarded merge + tombstones, exactly-once across stream restarts."""

import os

import pytest
from pyspark.sql import functions as F

from table2qb_spark.cdc.streaming import create_stream_table, run_stream_to_completion
from table2qb_spark.cdc.verify import table_sha256
from table2qb_spark.datagen import changelog as gen
from table2qb_spark.datagen.oracle import replay_oracle, table_sha256 as oracle_sha

BASE_SCHEMA = [
    ("repo", "string"),
    ("path", "string"),
    ("commit", "string"),
    ("lang", "string"),
    ("content", "string"),
]
KEYS = ["repo", "path"]
COLS = [c for c, _ in BASE_SCHEMA]


@pytest.fixture(scope="module")
def stream_events(spark, tmp_path_factory):
    """Small change log written as MANY files in hash-shuffled order, so the
    file-source micro-batches deliver events wildly out of seq order."""
    root = tmp_path_factory.mktemp("stream")
    ev = gen.gen_change_log(
        spark, 2000, 10, 30, seed=7, dup_rate=0.05, schema_evolution_after=None
    )
    path = str(root / "events")
    ev.repartition(20, F.xxhash64("seq")).write.parquet(path)
    return path


def expected_sha(spark, events_path):
    rows = [r.asDict() for r in spark.read.parquet(events_path).collect()]
    seen, uniq = set(), []
    for e in sorted(rows, key=lambda x: x["seq"]):
        if e["seq"] in seen:
            continue
        seen.add(e["seq"])
        uniq.append(e)
    state = replay_oracle([], uniq)
    return oracle_sha(list(state.values()), COLS)


def test_streaming_converges_out_of_order(spark, tmp_path, stream_events):
    t = create_stream_table(spark, str(tmp_path / "lake"), BASE_SCHEMA, KEYS, n_buckets=4)
    # maxFilesPerTrigger=3 over 20 shuffled files -> ~7 arrival-ordered
    # micro-batches, each spanning arbitrary seq ranges
    run_stream_to_completion(
        spark, t, stream_events, str(tmp_path / "ckpt"), max_files_per_trigger=3
    )
    got = table_sha256(t.read_live(), COLS)
    assert got == expected_sha(spark, stream_events)
    # bookkeeping: _seq recorded per row
    assert t.read().where(F.col("_seq").isNull()).count() == 0


def test_streaming_restart_is_exactly_once(spark, tmp_path, stream_events):
    t = create_stream_table(spark, str(tmp_path / "lake"), BASE_SCHEMA, KEYS, n_buckets=4)
    ckpt = str(tmp_path / "ckpt")
    run_stream_to_completion(spark, t, stream_events, ckpt, max_files_per_trigger=5)
    sha1 = table_sha256(t.read_live(), COLS)
    n_snapshots = t.current_snapshot_id()
    # restart the stream over the same checkpoint: no new data, no new commits
    run_stream_to_completion(spark, t, stream_events, ckpt, max_files_per_trigger=5)
    assert table_sha256(t.read_live(), COLS) == sha1
    assert t.current_snapshot_id() == n_snapshots


def test_new_checkpoint_does_not_collide_with_old_commits(spark, tmp_path, stream_events):
    """Commit ids are namespaced per checkpoint (app id): restarting with a
    FRESH checkpoint re-delivers batch_id 0.. but mints new commit ids, so
    the batches are re-applied (seq-guard keeps the state converged) instead
    of being silently dropped as 'redelivered' — the data-loss mode when a
    checkpoint is lost or a second stream feeds the same table."""
    t = create_stream_table(spark, str(tmp_path / "lake"), BASE_SCHEMA, KEYS, n_buckets=4)
    run_stream_to_completion(spark, t, stream_events, str(tmp_path / "ckpt1"), max_files_per_trigger=5)
    sha1 = table_sha256(t.read_live(), COLS)
    n_snapshots = t.current_snapshot_id()
    run_stream_to_completion(spark, t, stream_events, str(tmp_path / "ckpt2"), max_files_per_trigger=5)
    assert t.current_snapshot_id() > n_snapshots  # re-applied, not skipped
    assert table_sha256(t.read_live(), COLS) == sha1  # and still converged


def test_app_id_first_writer_wins(tmp_path):
    """The app-id marker is created exclusively: once any writer persisted an
    id, later callers (including a racer that already minted its own uuid)
    must read THAT id back — the marker is never replaced."""
    from table2qb_spark.cdc.streaming import checkpoint_app_id

    cp = str(tmp_path / "cp")
    os.makedirs(cp, exist_ok=True)
    marker = os.path.join(cp, "table2qb_app_id")
    with open(marker, "w", encoding="utf-8") as f:
        f.write("first-writer")
    assert checkpoint_app_id(cp) == "first-writer"
    # simulate the loser's late attempt: marker exists -> link fails -> reread
    assert checkpoint_app_id(cp) == "first-writer"
    with open(marker) as f:
        assert f.read().strip() == "first-writer"
    # and a fresh checkpoint mints + persists exactly one stable id
    cp2 = str(tmp_path / "cp2")
    a = checkpoint_app_id(cp2)
    assert checkpoint_app_id(cp2) == a and len(a) == 12
