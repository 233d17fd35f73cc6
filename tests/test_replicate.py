"""Lake-to-lake replication (lake/replicate.py + cdc-replicate CLI).

Load-bearing properties:
- bootstrap + N syncs leave the mirror digest-identical to the source,
  including across a DIFFERENT bucket count (layout independence);
- each sync is exactly-once (re-run = marker skip, crash between commit
  and nothing — the cursor IS in the commit);
- source schema ADD flows to the mirror before the rows that need it;
- expired cursor fails loudly; --full-resync reconciles, including
  deleting mirror keys the source no longer has.
"""
import json
import os

from table2qb_spark.cdc.verify import table_sha256
from table2qb_spark.lake.expire import expire_snapshots
from table2qb_spark.lake.merge import merge_upsert
from table2qb_spark.lake.replicate import replicate
from table2qb_spark.lake.table import LakeTable
from table2qb_spark.main import main
from tests.test_rollback import batch_df, make_table, three_batches

import pytest


def _digest(t, cols=("repo", "path", "commit", "lang", "content")):
    return table_sha256(t.read().select(*cols))


class TestReplicate:
    def test_bootstrap_then_incremental_syncs(self, spark, tmp_path):
        t, _ = three_batches(spark, tmp_path)
        mirror = str(tmp_path / "mirror")
        r = replicate(spark, t.path, mirror, n_buckets=4)  # different layout
        assert r["bootstrap"]
        m = LakeTable(spark, mirror)
        assert m.snapshot().n_buckets == 4
        assert _digest(m) == _digest(t)

        merge_upsert(t, batch_df(spark, [
            (6, "I", "r4", "d.py", "c6", "py", "v1"),
            (7, "U", "r1", "a.py", "c7", "py", "v3"),
            (8, "D", "r3", "c.py", None, None, None),
        ]), "b4")
        r = replicate(spark, t.path, mirror)
        assert r["cursor"] == t.current_snapshot_id()
        assert r["upserts"] == 2 and r["deletes"] == 1
        assert _digest(m) == _digest(t)

    def test_sync_is_exactly_once(self, spark, tmp_path):
        t, _ = three_batches(spark, tmp_path)
        mirror = str(tmp_path / "mirror")
        replicate(spark, t.path, mirror)
        merge_upsert(t, batch_df(spark, [
            (6, "U", "r1", "a.py", "c6", "py", "v3"),
        ]), "b4")
        r1 = replicate(spark, t.path, mirror)
        assert not r1["skipped"]
        r2 = replicate(spark, t.path, mirror)
        assert r2.get("up_to_date")
        m = LakeTable(spark, mirror)
        assert m.has_commit(f"repl-{r1['from']}-{r1['cursor']}")
        assert _digest(m) == _digest(t)

    def test_schema_add_flows_to_mirror(self, spark, tmp_path):
        t, _ = three_batches(spark, tmp_path)
        mirror = str(tmp_path / "mirror")
        replicate(spark, t.path, mirror)
        t.evolve_schema(add_columns=[("license", "string")])
        merge_upsert(t, spark.createDataFrame(
            [(6, "I", "r5", "e.py", "c6", "py", "v1", "mit")],
            "seq long, op string, repo string, path string, commit string, "
            "lang string, content string, license string",
        ), "b4")
        r = replicate(spark, t.path, mirror)
        assert r["schema_added"] == ["license"]
        m = LakeTable(spark, mirror)
        cols = ("repo", "path", "commit", "lang", "content", "license")
        assert table_sha256(m.read().select(*cols)) == table_sha256(
            t.read().select(*cols)
        )

    def test_expired_cursor_then_full_resync(self, spark, tmp_path):
        t, _ = three_batches(spark, tmp_path)
        mirror = str(tmp_path / "mirror")
        replicate(spark, t.path, mirror)
        merge_upsert(t, batch_df(spark, [
            (6, "I", "r4", "d.py", "c6", "py", "v1"),
        ]), "b4")
        merge_upsert(t, batch_df(spark, [
            (7, "D", "r1", "a.py", None, None, None),
        ]), "b5")
        os.environ["SPARK_GRAFT_ORPHAN_GRACE_SEC"] = "0"
        try:
            expire_snapshots(t, keep_last=1)
        finally:
            del os.environ["SPARK_GRAFT_ORPHAN_GRACE_SEC"]
        with pytest.raises(ValueError, match="full-resync"):
            replicate(spark, t.path, mirror)
        r = replicate(spark, t.path, mirror, full_resync=True)
        assert r["full_resync"]
        m = LakeTable(spark, mirror)
        assert _digest(m) == _digest(t)
        assert m.read().where("repo = 'r1'").count() == 0  # dead key gone

    def test_guards(self, spark, tmp_path, capsys):
        t, _ = three_batches(spark, tmp_path)
        # a hand-made table without repl_cursor is refused
        alien = make_table(spark, tmp_path / "alien")
        merge_upsert(alien, batch_df(spark, [
            (1, "I", "r1", "a.py", "c1", "py", "v1"),
        ]), "b1")
        with pytest.raises(ValueError, match="not created by"):
            replicate(spark, t.path, alien.path)

    def test_cli(self, spark, tmp_path, capsys):
        t, _ = three_batches(spark, tmp_path)
        mirror = str(tmp_path / "mirror")
        assert main(["cdc-replicate", "--source", t.path,
                     "--target", mirror, "--buckets", "4"]) == 0
        out = json.loads(capsys.readouterr().out)
        assert out["bootstrap"]
        assert main(["cdc-replicate", "--source", t.path,
                     "--target", mirror]) == 0
        assert json.loads(capsys.readouterr().out).get("up_to_date")


class TestTombstoneSource:
    def test_live_state_mirror_of_tombstone_source(self, spark, tmp_path):
        # a streaming-shaped source (seq-guarded + tombstones) replicates as
        # a LIVE-STATE mirror: bookkeeping columns stay home, tombstoned
        # keys are absent, and a delete arriving AFTER bootstrap (which the
        # source materializes as a _deleted=true row-image, not a 'd'
        # envelope row) still removes the key from the mirror
        from tests.test_rollback import BASE_SCHEMA, KEYS

        t = LakeTable.create(
            spark, str(tmp_path / "src"),
            BASE_SCHEMA + [("_seq", "long"), ("_deleted", "boolean")],
            KEYS, n_buckets=8,
        )
        merge_upsert(t, batch_df(spark, [
            (10, "I", "r1", "a.py", "c1", "py", "v1"),
            (11, "I", "r2", "b.py", "c1", "go", "v1"),
            (12, "D", "r2", "b.py", None, None, None),  # tombstoned pre-boot
        ]), "g1", batch_size_hint=3)

        mirror = str(tmp_path / "mirror")
        replicate(spark, t.path, mirror)
        m = LakeTable(spark, mirror)
        cols = {c["name"] for c in m.snapshot().current_schema()}
        assert "_seq" not in cols and "_deleted" not in cols
        assert {r["repo"] for r in m.read().collect()} == {"r1"}

        # post-bootstrap delete + insert sync through the envelope path
        merge_upsert(t, batch_df(spark, [
            (13, "D", "r1", "a.py", None, None, None),
            (14, "I", "r3", "c.py", "c2", "rs", "v1"),
        ]), "g2", batch_size_hint=2)
        replicate(spark, t.path, mirror)
        assert {r["repo"] for r in m.read().collect()} == {"r3"}
        # mirror live state == source live state, column-for-column
        src_live = table_sha256(
            t.read_live().select("repo", "path", "commit", "lang", "content")
        )
        dst_live = table_sha256(
            m.read().select("repo", "path", "commit", "lang", "content")
        )
        assert src_live == dst_live
