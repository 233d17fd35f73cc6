"""Outbound changelog subscription (lake/subscribe.py + cdc-subscribe CLI).

Load-bearing properties:
- bootstrap emits the FULL current state as op='r' rows (Debezium initial
  snapshot), then the cursor sits at current and a second poll emits nothing;
- per-commit steps replay a consumer copy to the exact producer state
  (loop closure, same as test_envelope but across MULTIPLE steps with a
  cursor in between);
- crash between data-write and cursor-write re-emits the SAME step dir
  idempotently (overwrite semantics);
- a cursor expired past by cdc-expire fails loudly (purged-binlog contract);
- rollback appears as an ordinary step whose envelope inverts the rolled
  back changes.
"""
import json
import os

from pyspark.sql import functions as F

from table2qb_spark.cdc.verify import table_sha256
from table2qb_spark.lake.merge import merge_upsert
from table2qb_spark.lake.subscribe import (
    CursorExpiredError,
    load_cursor,
    pending_steps,
    store_cursor,
    subscribe_follow,
    subscribe_once,
)
from table2qb_spark.main import main
from tests.test_rollback import batch_df, make_table, three_batches

import pytest


def _read_steps(spark, out_dir, names):
    return [
        spark.read.parquet(os.path.join(out_dir, n)) for n in names
    ]


class TestSubscribe:
    def test_bootstrap_then_idle(self, spark, tmp_path):
        t, _ = three_batches(spark, tmp_path)
        out, ck = str(tmp_path / "sub"), str(tmp_path / "ck")
        r = subscribe_once(t, out, ck)
        assert r["steps"] == 1 and r["emitted"][0]["op"] == "bootstrap"
        sid = t.current_snapshot_id()
        assert r["cursor"] == sid
        boot = spark.read.parquet(os.path.join(out, f"bootstrap_{sid}"))
        rows = boot.collect()
        # full state: r1/a.py v2 + r3/c.py v1 (r2/b.py deleted in b3)
        assert {r["op"] for r in rows} == {"r"}
        assert all(r["before"] is None for r in rows)
        assert {(r["repo"], r["path"]) for r in rows} == {
            ("r1", "a.py"), ("r3", "c.py")
        }
        # envelope-schema parity with the incremental steps
        assert set(boot.columns) == {
            "op", "repo", "path", "before", "after",
            "from_snapshot", "to_snapshot", "ts_ms",
        }
        # second poll: nothing new
        r2 = subscribe_once(t, out, ck)
        assert r2["steps"] == 0 and r2["cursor"] == sid

    def test_steps_replay_to_producer_state(self, spark, tmp_path):
        t, sid_b1 = three_batches(spark, tmp_path)
        out, ck = str(tmp_path / "sub"), str(tmp_path / "ck")
        # start streaming from b1 (no bootstrap), expect one step per commit
        r = subscribe_once(t, out, ck, from_snapshot=sid_b1)
        assert [e["op"] for e in r["emitted"]] == ["diff", "diff"]
        names = [e["step"] for e in r["emitted"]]

        # consumer: reproduce b1 state, then apply each step in order
        t2 = make_table(spark, tmp_path / "consumer")
        merge_upsert(t2, batch_df(spark, [
            (1, "I", "r1", "a.py", "c1", "py", "v1"),
            (2, "I", "r2", "b.py", "c2", "go", "v1"),
        ]), "b1")
        value_cols = ["commit", "lang", "content"]
        for i, df in enumerate(_read_steps(spark, out, names)):
            events = df.select(
                F.when(F.col("op") == "d", "D").otherwise("U").alias("op"),
                F.lit(100 + i).alias("seq"),
                "repo", "path",
                *[F.col(f"after.{c}").alias(c) for c in value_cols],
            )
            merge_upsert(t2, events, f"step{i}")
        cols = ["repo", "path", "commit", "lang", "content"]
        assert table_sha256(t.read().select(*cols)) == table_sha256(
            t2.read().select(*cols)
        )

    def test_coalesce_single_step(self, spark, tmp_path):
        t, sid_b1 = three_batches(spark, tmp_path)
        out, ck = str(tmp_path / "sub"), str(tmp_path / "ck")
        r = subscribe_once(t, out, ck, from_snapshot=sid_b1, coalesce=True)
        assert r["steps"] == 1
        sid = t.current_snapshot_id()
        assert r["emitted"][0]["step"] == f"step_{sid_b1}_{sid}"

    def test_crash_reemits_step_idempotently(self, spark, tmp_path):
        t, sid_b1 = three_batches(spark, tmp_path)
        out, ck = str(tmp_path / "sub"), str(tmp_path / "ck")
        r = subscribe_once(t, out, ck, from_snapshot=sid_b1)
        names = [e["step"] for e in r["emitted"]]
        before = {
            n: spark.read.parquet(os.path.join(out, n)).sort("repo", "path")
            .collect() for n in names
        }
        # simulate a crash BETWEEN last step's data-write and cursor-write:
        # rewind the cursor one step and poll again
        first_to = r["emitted"][0]["to_snapshot"]
        store_cursor(ck, first_to)
        r2 = subscribe_once(t, out, ck)
        assert [e["step"] for e in r2["emitted"]] == [names[-1]]
        after = spark.read.parquet(
            os.path.join(out, names[-1])).sort("repo", "path").collect()
        assert after == before[names[-1]]
        assert r2["cursor"] == t.current_snapshot_id()

    def test_expired_cursor_fails_loudly(self, spark, tmp_path):
        from table2qb_spark.lake.expire import expire_snapshots

        t, sid_b1 = three_batches(spark, tmp_path)
        out, ck = str(tmp_path / "sub"), str(tmp_path / "ck")
        store_cursor(ck, sid_b1)
        expire_snapshots(t, keep_last=1)
        with pytest.raises(CursorExpiredError, match="Re-bootstrap"):
            subscribe_once(t, out, ck)

    def test_rollback_is_an_ordinary_inverse_step(self, spark, tmp_path):
        t, sid_b1 = three_batches(spark, tmp_path)
        out, ck = str(tmp_path / "sub"), str(tmp_path / "ck")
        subscribe_once(t, out, ck)  # bootstrap at current
        t.rollback(sid_b1)
        r = subscribe_once(t, out, ck)
        assert r["steps"] == 1
        df = spark.read.parquet(os.path.join(out, r["emitted"][0]["step"]))
        ops = {(x["repo"], x["path"]): x["op"] for x in df.collect()}
        # b2 updated r1/a.py (now reverted -> u), inserted r3/c.py (-> d);
        # b3 deleted r2/b.py (now restored -> c)
        assert ops == {("r1", "a.py"): "u", ("r3", "c.py"): "d",
                       ("r2", "b.py"): "c"}

    def test_follow_max_polls(self, spark, tmp_path):
        t, _ = three_batches(spark, tmp_path)
        out, ck = str(tmp_path / "sub"), str(tmp_path / "ck")
        r = subscribe_follow(t, out, ck, poll_seconds=0.01, max_polls=2)
        assert r["polls"] == 2 and r["steps"] == 1  # bootstrap only

    def test_cli_roundtrip(self, spark, tmp_path, capsys):
        t, sid_b1 = three_batches(spark, tmp_path)
        out = str(tmp_path / "sub")
        assert main(["cdc-subscribe", "--table", t.path, "--out", out,
                     "--from-snapshot", str(sid_b1)]) == 0
        r = json.loads(capsys.readouterr().out)
        assert r["steps"] == 2 and r["cursor"] == t.current_snapshot_id()
        assert all(e["rows"] is not None for e in r["emitted"])
        # default checkpoint lives under out/; second call is a no-op
        assert os.path.exists(os.path.join(out, "_checkpoint"))
        assert main(["cdc-subscribe", "--table", t.path, "--out", out]) == 0
        assert json.loads(capsys.readouterr().out)["steps"] == 0

    def test_pending_steps_requires_cursor(self, spark, tmp_path):
        t, _ = three_batches(spark, tmp_path)
        with pytest.raises(ValueError, match="bootstrap"):
            pending_steps(t, None)

    def test_cursor_io(self, tmp_path):
        ck = str(tmp_path / "ck")
        assert load_cursor(ck) is None
        store_cursor(ck, 7)
        assert load_cursor(ck) == {"last_snapshot": 7}
