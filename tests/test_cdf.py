"""Change Data Feed (lake/cdf.py + merge-time capture in lake/merge.py).

Load-bearing property — FEED == DIFF: over any commit range, the coalesced
``changes_between`` must be digest-identical to ``snapshot_diff_envelope``,
whether the range is covered by captured feeds, by the diff fallback, or a
mix (late-mat bootstrap, schema evolution, compaction in the middle).
Plus: capture never fires for keys the batch didn't win (stale seq-guarded
events), tombstone tables mirror the physical row model, consumers
(materialize / replicate / subscribe) run feed-only when feeds cover the
range, expiry sweeps orphan feeds but keeps live ones, and
``cdc-alter --set-property`` turns capture on mid-life.
"""
import os

import pytest
from pyspark.sql import functions as F

from table2qb_spark.cdc.verify import table_sha256
from table2qb_spark.lake import cdf as cdf_mod
from table2qb_spark.lake.cdf import changes_between, feed_of
from table2qb_spark.lake.diff import snapshot_diff_envelope
from table2qb_spark.lake.merge import merge_upsert
from table2qb_spark.lake.table import LakeTable
from table2qb_spark.main import main
from tests.test_rollback import BASE_SCHEMA, KEYS, batch_df


def cdf_table(spark, tmp_path, name="t", schema=None, **props):
    return LakeTable.create(
        spark, str(tmp_path / name), schema or BASE_SCHEMA, KEYS,
        n_buckets=4, properties={"cdf.enabled": "true", **props},
    )


def seed(spark, t):
    """Late-mat bootstrap (NOT captured), then two captured batches with
    an update, a delete, an insert, a delete-of-absent and an identical
    rewrite."""
    merge_upsert(t, batch_df(spark, [
        (1, "I", "r1", "a.py", "c1", "py", "v1"),
        (2, "I", "r1", "b.py", "c1", "py", "v1"),
        (3, "I", "r2", "m.go", "c2", "go", "v1"),
    ]), "b1")
    merge_upsert(t, batch_df(spark, [
        (4, "U", "r1", "a.py", "c3", "py", "v2"),
        (5, "D", "r1", "b.py", None, None, None),
        (6, "I", "r3", "x.rs", "c4", "rs", "v1"),
    ]), "b2", batch_size_hint=3)
    merge_upsert(t, batch_df(spark, [
        (7, "D", "zz", "zz", None, None, None),       # delete of absent key
        (8, "U", "r2", "m.go", "c2", "go", "v1"),     # identical rewrite
        (9, "U", "r1", "a.py", "c5", "py", "v3"),
    ]), "b3", batch_size_hint=3)
    return t


def assert_parity(t, frm, to=None):
    to = to if to is not None else t.current_snapshot_id()
    a = snapshot_diff_envelope(t, frm, to)
    b = changes_between(t, frm, to, coalesce=True)
    assert table_sha256(a) == table_sha256(b)
    return b


def no_diff_fallback(monkeypatch):
    """Make any diff fallback inside changes_between explode — proof the
    range was served from captured feeds alone."""
    def boom(*a, **k):
        raise AssertionError("diff fallback used where feeds should cover")
    monkeypatch.setattr(cdf_mod, "snapshot_diff_envelope", boom)


class TestCapture:
    def test_capture_and_parity_all_ranges(self, spark, tmp_path):
        t = seed(spark, cdf_table(spark, tmp_path))
        # b1 is late-mat: not captured; b2/b3 captured with event counts
        hist = t.history()
        assert feed_of(hist[1]) is None            # late-mat bootstrap
        assert hist[2].summary["cdf_rows"] == 3    # u + d + c
        assert hist[3].summary["cdf_rows"] == 2    # identical rewrite + u
        for frm in (1, 2, 3):
            assert_parity(t, frm)

    def test_feeds_only_no_fallback(self, spark, tmp_path, monkeypatch):
        t = seed(spark, cdf_table(spark, tmp_path))
        no_diff_fallback(monkeypatch)
        env = changes_between(t, 2, 4, coalesce=True)  # b2+b3: feeds only
        rows = {(r["repo"], r["path"]): r["op"] for r in env.collect()}
        # identical rewrite (r2/m.go) and delete-of-absent cancel out
        assert rows == {("r1", "a.py"): "u", ("r1", "b.py"): "d",
                        ("r3", "x.rs"): "c"}

    def test_per_step_union_keeps_event_level_rows(self, spark, tmp_path):
        t = seed(spark, cdf_table(spark, tmp_path))
        raw = changes_between(t, 2, 4, coalesce=False)
        # 3 rows from b2 + 2 from b3 (event-level: identical rewrite kept)
        assert raw.count() == 5
        assert set(raw.columns) >= {"op", "before", "after", "to_snapshot"}

    def test_empty_and_invalid_ranges(self, spark, tmp_path):
        t = seed(spark, cdf_table(spark, tmp_path))
        assert changes_between(t, 4, 4).count() == 0
        with pytest.raises(ValueError, match="forward only"):
            changes_between(t, 4, 2)
        with pytest.raises(ValueError, match="ancestry"):
            changes_between(t, 99, None)

    def test_empty_batch_records_empty_feed(self, spark, tmp_path):
        t = seed(spark, cdf_table(spark, tmp_path))
        empty = batch_df(spark, []).limit(0)
        merge_upsert(t, empty, "b-empty", batch_size_hint=0)
        snap = t.snapshot()
        assert snap.summary["cdf_rows"] == 0
        assert snap.summary["cdf_sid"] == snap.snapshot_id
        assert feed_of(snap) == ""  # captured-and-empty, reader skips
        assert_parity(t, 2)

    def test_metadata_commits_inherit_but_never_reuse(self, spark, tmp_path):
        t = seed(spark, cdf_table(spark, tmp_path))
        t.evolve_schema(add_columns=[("license", "string")])
        snap = t.snapshot()
        # summary inherited b3's cdf_dir, but cdf_sid pins it to b3
        assert snap.summary.get("cdf_dir")
        assert feed_of(snap) is None
        merge_upsert(t, spark.createDataFrame(
            [(10, "U", "r3", "x.rs", "c9", "rs", "v2", "mit")],
            "seq long, op string, repo string, path string, commit string, "
            "lang string, content string, license string",
        ), "b4", batch_size_hint=1)
        # range spans feeds + schema commit; feed structs align to license
        env = assert_parity(t, 2)
        lic = {r["path"]: r["after"]["license"] for r in env.collect()
               if r["after"] is not None}
        assert lic["x.rs"] == "mit"


class TestGuardedAndTombstones:
    SCHEMA = BASE_SCHEMA + [("_seq", "long"), ("_deleted", "boolean")]

    def _guarded(self, spark, tmp_path):
        t = cdf_table(spark, tmp_path, schema=self.SCHEMA)
        merge_upsert(t, batch_df(spark, [
            (10, "I", "r1", "a.py", "c1", "py", "v1"),
            (11, "I", "r2", "b.py", "c1", "go", "v1"),
        ]), "g1", batch_size_hint=2)
        return t

    def test_stale_event_emits_no_change(self, spark, tmp_path):
        t = self._guarded(spark, tmp_path)
        sid = t.current_snapshot_id()
        merge_upsert(t, batch_df(spark, [
            (5, "U", "r1", "a.py", "c9", "py", "STALE"),   # loses seq guard
            (12, "U", "r2", "b.py", "c2", "go", "v2"),
        ]), "g2", batch_size_hint=2)
        snap = t.snapshot()
        assert snap.summary["cdf_rows"] == 1  # only the winning update
        env = assert_parity(t, sid)
        rows = env.collect()
        assert len(rows) == 1 and rows[0]["path"] == "b.py"

    def test_tombstone_delete_mirrors_physical_row(self, spark, tmp_path):
        t = self._guarded(spark, tmp_path)
        sid = t.current_snapshot_id()
        merge_upsert(t, batch_df(spark, [
            (13, "D", "r1", "a.py", None, None, None),
        ]), "g3", batch_size_hint=1)
        env = assert_parity(t, sid)
        r = env.collect()[0]
        # physical model: the tombstone row APPEARS as an update with
        # _deleted=true (what read() and therefore the diff see)
        assert r["op"] == "u" and r["after"]["_deleted"] is True


class TestConsumers:
    def test_materialize_feed_only(self, spark, tmp_path, monkeypatch):
        from table2qb_spark.lake.materialize import (
            create_view, full_aggregate, parse_aggs, refresh_view,
        )
        t = seed(spark, cdf_table(spark, tmp_path))
        vp = str(tmp_path / "mv")
        create_view(spark, t.path, vp, ["lang"], ["docs=count(*)"])
        merge_upsert(t, batch_df(spark, [
            (20, "I", "r4", "n.py", "c1", "py", "v1"),
            (21, "D", "r2", "m.go", None, None, None),
        ]), "b5", batch_size_hint=2)
        no_diff_fallback(monkeypatch)
        r = refresh_view(spark, vp)
        assert not r.get("up_to_date")
        view = LakeTable(spark, vp)
        want = {(x["lang"], x["docs"]) for x in full_aggregate(
            t.read(), ["lang"], parse_aggs(["docs=count(*)"])).collect()}
        assert {(x["lang"], x["docs"]) for x in view.read().collect()} == want

    def test_replicate_feed_only(self, spark, tmp_path, monkeypatch):
        from table2qb_spark.lake.replicate import replicate
        t = seed(spark, cdf_table(spark, tmp_path))
        mirror = str(tmp_path / "mirror")
        replicate(spark, t.path, mirror, n_buckets=2)
        merge_upsert(t, batch_df(spark, [
            (22, "U", "r1", "a.py", "c6", "py", "v4"),
            (23, "D", "r3", "x.rs", None, None, None),
        ]), "b6", batch_size_hint=2)
        no_diff_fallback(monkeypatch)
        r = replicate(spark, t.path, mirror)
        assert r["upserts"] == 1 and r["deletes"] == 1
        cols = [c["name"] for c in t.snapshot().current_schema()]
        assert table_sha256(t.read().select(*cols)) == table_sha256(
            LakeTable(spark, mirror).read().select(*cols))

    def test_subscribe_steps_from_feeds(self, spark, tmp_path, monkeypatch):
        from table2qb_spark.lake.subscribe import subscribe_once
        t = seed(spark, cdf_table(spark, tmp_path))
        out, ckpt = str(tmp_path / "feed"), str(tmp_path / "ckpt")
        subscribe_once(t, out, ckpt)  # bootstrap
        merge_upsert(t, batch_df(spark, [
            (24, "U", "r1", "a.py", "c7", "py", "v5"),
        ]), "b7", batch_size_hint=1)
        no_diff_fallback(monkeypatch)
        r = subscribe_once(t, out, ckpt)
        assert r["steps"] == 1
        step_dir = [d for d in os.listdir(out) if d.startswith("step_")]
        rows = spark.read.parquet(os.path.join(out, step_dir[0])).collect()
        assert len(rows) == 1 and rows[0]["op"] == "u"


class TestLifecycle:
    def test_expire_sweeps_orphan_keeps_live(self, spark, tmp_path,
                                             monkeypatch):
        from table2qb_spark.lake.expire import expire_snapshots
        monkeypatch.setenv("SPARK_GRAFT_ORPHAN_GRACE_SEC", "0")
        t = seed(spark, cdf_table(spark, tmp_path))
        live_rel = t.snapshot().summary["cdf_dir"]
        orphan = os.path.join(t.path, "changes", "snap-zzz-orphan")
        os.makedirs(orphan)
        with open(os.path.join(orphan, "part-0.parquet"), "w") as f:
            f.write("junk")
        expire_snapshots(t, keep_last=2)
        assert not os.listdir(orphan)
        assert os.listdir(os.path.join(t.path, live_rel))
        # feeds of EXPIRED snapshots whose headers are gone get swept too,
        # unless inherited summaries still reference them — b2's own header
        # survived keep_last=2? (create,b1,b2,b3 -> keep b2(sid3),b3(sid4))
        assert_parity(t, t.history()[0].snapshot_id)

    def test_alter_set_property_enables_capture(self, spark, tmp_path):
        t = LakeTable.create(spark, str(tmp_path / "plain"), BASE_SCHEMA,
                             KEYS, n_buckets=4)
        merge_upsert(t, batch_df(spark, [
            (1, "I", "r1", "a.py", "c1", "py", "v1"),
        ]), "p1")
        assert main(["cdc-alter", "--table", t.path,
                     "--set-property", "cdf.enabled=true"]) == 0
        sid = t.current_snapshot_id()
        merge_upsert(t, batch_df(spark, [
            (2, "U", "r1", "a.py", "c2", "py", "v2"),
        ]), "p2", batch_size_hint=1)
        snap = t.snapshot()
        assert snap.summary["cdf_rows"] == 1
        assert feed_of(snap) is not None
        assert_parity(t, sid)

    def test_cli_init_cdf_flag(self, spark, tmp_path):
        p = str(tmp_path / "cli")
        assert main(["cdc-init", "--table", p, "--buckets", "4",
                     "--cdf"]) == 0
        assert LakeTable(spark, p).snapshot().properties[
            "cdf.enabled"] == "true"
