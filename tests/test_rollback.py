"""Metadata-only rollback (``LakeTable.rollback`` + ``cdc-rollback`` CLI).

Reference analog: Iceberg's ``rollback_to_snapshot`` — the reference CLI has
no lake layer, so this surface is north-rule-added; semantics are pinned
against our own time-travel reads (the rollback state must be byte-identical
to ``read(snapshot_id=target)``) and the exactly-once commit markers (a
rollback must un-mark the undone commits so a replay RE-APPLIES them).
"""
import json
import os

import pytest

from table2qb_spark.cdc.verify import table_sha256
from table2qb_spark.lake.expire import expire_snapshots
from table2qb_spark.lake.merge import merge_upsert
from table2qb_spark.lake.table import LakeTable

BASE_SCHEMA = [
    ("repo", "string"),
    ("path", "string"),
    ("commit", "string"),
    ("lang", "string"),
    ("content", "string"),
]
KEYS = ["repo", "path"]


def make_table(spark, tmp_path, n_buckets=8):
    return LakeTable.create(
        spark, str(tmp_path / "t"), BASE_SCHEMA, KEYS, n_buckets=n_buckets
    )


def batch_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "seq long, op string, repo string, path string, commit string, "
        "lang string, content string",
    )


def three_batches(spark, tmp_path):
    t = make_table(spark, tmp_path)
    merge_upsert(t, batch_df(spark, [
        (1, "I", "r1", "a.py", "c1", "py", "v1"),
        (2, "I", "r2", "b.py", "c2", "go", "v1"),
    ]), "b1")
    sid_b1 = t.current_snapshot_id()
    merge_upsert(t, batch_df(spark, [
        (3, "U", "r1", "a.py", "c3", "py", "v2"),
        (4, "I", "r3", "c.py", "c4", "rs", "v1"),
    ]), "b2")
    merge_upsert(t, batch_df(spark, [
        (5, "D", "r2", "b.py", None, None, None),
    ]), "b3")
    return t, sid_b1


class TestRollback:
    def test_restores_target_state_exactly(self, spark, tmp_path):
        t, sid_b1 = three_batches(spark, tmp_path)
        want = table_sha256(t.read(snapshot_id=sid_b1))
        head = t.current_snapshot_id()
        snap = t.rollback(sid_b1)
        assert snap.snapshot_id == head + 1  # history stays linear
        assert snap.parent_id == head
        assert table_sha256(t.read()) == want
        assert t.row_count() == 2
        assert snap.summary["rollback_to"] == sid_b1
        assert snap.summary["rollback_of"] == head

    def test_undone_snapshots_remain_time_travelable(self, spark, tmp_path):
        t, sid_b1 = three_batches(spark, tmp_path)
        head = t.current_snapshot_id()
        head_sha = table_sha256(t.read())
        t.rollback(sid_b1)
        # the undone head is still in the ancestry until expiry
        assert table_sha256(t.read(snapshot_id=head)) == head_sha

    def test_markers_reset_so_replay_reapplies(self, spark, tmp_path):
        t, sid_b1 = three_batches(spark, tmp_path)
        t.rollback(sid_b1)
        # b2 was undone AND un-marked: the same commit_id re-applies
        stats = merge_upsert(t, batch_df(spark, [
            (3, "U", "r1", "a.py", "c3", "py", "v2"),
            (4, "I", "r3", "c.py", "c4", "rs", "v1"),
        ]), "b2")
        assert not stats.get("skipped")
        state = {(r["repo"], r["path"]): r["content"] for r in t.read().collect()}
        assert state[("r1", "a.py")] == "v2" and ("r3", "c.py") in state
        # b1 was NOT undone: still exactly-once-skipped
        stats = merge_upsert(t, batch_df(spark, [
            (1, "I", "r1", "a.py", "c1", "py", "v1"),
        ]), "b1")
        assert stats.get("skipped")

    def test_keep_markers_skips_undone_batches(self, spark, tmp_path):
        t, sid_b1 = three_batches(spark, tmp_path)
        sha = table_sha256(t.read(snapshot_id=sid_b1))
        t.rollback(sid_b1, reset_commit_markers=False)
        stats = merge_upsert(t, batch_df(spark, [
            (3, "U", "r1", "a.py", "c3", "py", "v2"),
        ]), "b2")
        assert stats.get("skipped")
        assert table_sha256(t.read()) == sha

    def test_rejects_current_and_newer_targets(self, spark, tmp_path):
        t, _ = three_batches(spark, tmp_path)
        cur = t.current_snapshot_id()
        with pytest.raises(ValueError, match="not older"):
            t.rollback(cur)
        with pytest.raises(ValueError, match="not older"):
            t.rollback(cur + 5)

    def test_rejects_expired_target(self, spark, tmp_path):
        t, sid_b1 = three_batches(spark, tmp_path)
        expire_snapshots(t, keep_last=1)
        with pytest.raises(ValueError, match="unknown or expired"):
            t.rollback(sid_b1)

    def test_rollback_to_initial_empty_snapshot_truncates(self, spark, tmp_path):
        t, _ = three_batches(spark, tmp_path)
        snap = t.rollback(1)
        assert t.read().count() == 0
        assert snap.summary["row_count"] == 0
        # and the table keeps working afterwards
        merge_upsert(t, batch_df(spark, [
            (9, "I", "r9", "z.py", "c9", "py", "v9"),
        ]), "b9")
        assert t.row_count() == 1

    def test_schema_evolution_is_undone_with_the_data(self, spark, tmp_path):
        t, sid_b1 = three_batches(spark, tmp_path)
        t.evolve_schema(add_columns=[("license", "string")])
        assert "license" in t.read().columns
        t.rollback(sid_b1)
        assert "license" not in t.read().columns
        assert t.snapshot().schema_version == t.snapshot(sid_b1).schema_version

    def test_expire_after_rollback_keeps_shared_manifests(self, spark, tmp_path):
        # The rollback snapshot references the TARGET's manifest/data files;
        # expiring everything between them must not sweep shared files.
        t, sid_b1 = three_batches(spark, tmp_path)
        want = table_sha256(t.read(snapshot_id=sid_b1))
        t.rollback(sid_b1)
        expire_snapshots(t, keep_last=1)
        assert table_sha256(t.read()) == want

    def test_rollback_of_rollback(self, spark, tmp_path):
        t, sid_b1 = three_batches(spark, tmp_path)
        head = t.current_snapshot_id()
        head_sha = table_sha256(t.read())
        rb = t.rollback(sid_b1)
        snap = t.rollback(head)  # roll forward again (head is older than rb)
        assert snap.snapshot_id == rb.snapshot_id + 1
        assert table_sha256(t.read()) == head_sha


class TestRollbackCli:
    def _main(self, argv):
        from table2qb_spark.main import main

        return main(argv)

    def test_cli_roundtrip(self, spark, tmp_path, capsys):
        t, sid_b1 = three_batches(spark, tmp_path)
        want = table_sha256(t.read(snapshot_id=sid_b1))
        rc = self._main([
            "cdc-rollback", "--table", t.path, "--to-snapshot", str(sid_b1),
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["rolled_back_to"] == sid_b1 and out["rows"] == 2
        t2 = LakeTable(spark, t.path)
        assert table_sha256(t2.read()) == want

    def test_cli_as_of_and_errors(self, spark, tmp_path, capsys):
        t, sid_b1 = three_batches(spark, tmp_path)
        ts = t.snapshot(sid_b1).timestamp_ms
        rc = self._main([
            "cdc-rollback", "--table", t.path,
            "--to-snapshot", str(sid_b1), "--as-of", str(ts),
        ])
        assert rc == 2  # mutually exclusive
        rc = self._main(["cdc-rollback", "--table", t.path])
        assert rc == 2  # one required
        rc = self._main([
            "cdc-rollback", "--table", t.path, "--to-snapshot", "999",
        ])
        assert rc == 1  # not older than current
        capsys.readouterr()
        rc = self._main([
            "cdc-rollback", "--table", t.path, "--as-of", str(ts),
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["rolled_back_to"] == sid_b1


class TestRollbackMergeOnRead:
    def test_mor_table_rollback_masks_correctly(self, spark, tmp_path):
        # A MOR snapshot's manifests include equality-delete files; rollback
        # reuses them verbatim, so read() must still mask through deletes.
        from table2qb_spark.cdc.streaming import create_stream_table
        from table2qb_spark.lake.mor import merge_mor

        t = create_stream_table(
            spark, str(tmp_path / "mor"), BASE_SCHEMA, KEYS, n_buckets=4
        )
        merge_mor(t, batch_df(spark, [
            (1, "I", "r1", "a.py", "c1", "py", "v1"),
            (2, "I", "r2", "b.py", "c2", "go", "v1"),
        ]), "m1")
        merge_mor(t, batch_df(spark, [
            (3, "U", "r1", "a.py", "c3", "py", "v2"),
            (4, "D", "r2", "b.py", None, None, None),
        ]), "m2")
        sid_m2 = t.current_snapshot_id()
        want = table_sha256(t.read_live())
        merge_mor(t, batch_df(spark, [
            (5, "I", "r3", "c.py", "c5", "rs", "v1"),
        ]), "m3")
        t.rollback(sid_m2)
        assert table_sha256(t.read_live()) == want
        state = {
            (r["repo"], r["path"]): r["content"]
            for r in t.read_live().collect()
        }
        assert state == {("r1", "a.py"): "v2"}
