"""Write-audit-publish (staged snapshots): stage -> audit -> publish/discard.

Reference analog: Iceberg's WAP pattern (stage a commit, audit it, then
fast-forward the branch). Pinned against our own invariants: a staged
snapshot is invisible to readers and carries NO commit marker (exactly-once
is decided at publish, so a discarded batch replays cleanly), the staged
header holds its snapshot-id slot against concurrent commits for the staged
grace window, expiry never touches in-flight headers, and publishing after
the table moved on is rejected instead of clobbering interleaved commits.
"""
import json

import pytest

from table2qb_spark.cdc.verify import table_sha256
from table2qb_spark.lake.expire import expire_snapshots
from table2qb_spark.lake.merge import merge_upsert
from table2qb_spark.lake.mor import merge_mor
from table2qb_spark.lake.table import ConcurrentCommitError
from table2qb_spark.main import main
from tests.test_mor import B1 as M_B1
from tests.test_mor import B2 as M_B2
from tests.test_mor import batch as m_batch
from tests.test_mor import mk as m_mk
from tests.test_rollback import batch_df, make_table

B1 = [
    (1, "I", "r1", "a.py", "c1", "py", "v1"),
    (2, "I", "r2", "b.py", "c2", "go", "v1"),
]
B2 = [
    (3, "U", "r1", "a.py", "c3", "py", "v2"),
    (4, "I", "r3", "c.py", "c4", "rs", "v1"),
]
B3 = [
    (5, "D", "r2", "b.py", None, None, None),
]


def _base(spark, tmp_path, name="t"):
    t = make_table(spark, tmp_path / name)
    merge_upsert(t, batch_df(spark, B1), "b1")
    return t


class TestStageAuditPublish:
    def test_staged_is_invisible_until_published(self, spark, tmp_path):
        t = _base(spark, tmp_path)
        sha_b1 = table_sha256(t.read())
        cur = t.current_snapshot_id()

        merge_upsert(t, batch_df(spark, B2), "b2", publish=False)
        # invisible: readers see the pre-stage state; no marker
        assert t.current_snapshot_id() == cur
        assert table_sha256(t.read()) == sha_b1
        assert not t.has_commit("b2")
        staged = t.staged_snapshots()
        assert staged == [cur + 1]
        # auditable: time-travel read of the staged id shows the batch
        audit = t.read(snapshot_id=staged[0])
        assert audit.where("repo = 'r3'").count() == 1
        sha_staged = table_sha256(audit)

        snap = t.publish_snapshot(staged[0])
        assert snap.commit_id == "b2"
        assert t.current_snapshot_id() == staged[0]
        assert t.has_commit("b2")
        assert table_sha256(t.read()) == sha_staged
        assert t.staged_snapshots() == []

    def test_publish_matches_direct_commit(self, spark, tmp_path):
        t = _base(spark, tmp_path, "staged")
        merge_upsert(t, batch_df(spark, B2), "b2", publish=False)
        t.publish_snapshot(t.staged_snapshots()[0])
        merge_upsert(t, batch_df(spark, B3), "b3")

        ctl = _base(spark, tmp_path, "ctl")
        merge_upsert(ctl, batch_df(spark, B2), "b2")
        merge_upsert(ctl, batch_df(spark, B3), "b3")
        assert table_sha256(t.read()) == table_sha256(ctl.read())

    def test_discard_releases_slot_and_replays(self, spark, tmp_path):
        t = _base(spark, tmp_path)
        merge_upsert(t, batch_df(spark, B2), "b2", publish=False)
        sid = t.staged_snapshots()[0]
        t.discard_snapshot(sid)
        assert t.staged_snapshots() == []
        assert not t.has_commit("b2")  # the batch will re-apply
        # the slot is free again: a direct commit of the same batch lands
        merge_upsert(t, batch_df(spark, B2), "b2")
        assert t.current_snapshot_id() == sid
        assert t.read().where("repo = 'r3'").count() == 1

    def test_staged_slot_blocks_concurrent_commit(self, spark, tmp_path):
        t = _base(spark, tmp_path)
        merge_upsert(t, batch_df(spark, B2), "b2", publish=False)
        with pytest.raises(ConcurrentCommitError):
            merge_upsert(t, batch_df(spark, B3), "b3")

    def test_publish_with_stale_parent_rejected(self, spark, tmp_path):
        # the staged slot blocks in-band commits AND rollback (both need the
        # held snapshot id), so a stale parent can only come from an
        # out-of-band VERSION move (operator restore / backup copy-in) —
        # simulate exactly that and require publish to refuse
        import os

        t = _base(spark, tmp_path)
        merge_upsert(t, batch_df(spark, B2), "b2", publish=False)
        sid = t.staged_snapshots()[0]
        with open(os.path.join(t.path, "_meta", "VERSION"), "w") as f:
            f.write("1")
        with pytest.raises(ConcurrentCommitError, match="discard and re-stage"):
            t.publish_snapshot(sid)

    def test_expire_never_touches_staged(self, spark, tmp_path):
        t = _base(spark, tmp_path)
        merge_upsert(t, batch_df(spark, B2), "b2", publish=False)
        sid = t.staged_snapshots()[0]
        sha_staged = table_sha256(t.read(snapshot_id=sid))
        res = expire_snapshots(t, keep_last=1)
        assert sid in res["retained"]
        t.publish_snapshot(sid)
        assert table_sha256(t.read()) == sha_staged

    def test_mor_stage_and_publish(self, spark, tmp_path):
        t = m_mk(spark, tmp_path, "mor")
        merge_mor(t, m_batch(spark, M_B1), "b0")
        sha_b0 = table_sha256(t.read_live())
        merge_mor(t, m_batch(spark, M_B2), "b1", publish=False)
        assert table_sha256(t.read_live()) == sha_b0  # still invisible
        sid = t.staged_snapshots()[0]
        t.publish_snapshot(sid)

        ctl = m_mk(spark, tmp_path, "morctl")
        merge_mor(ctl, m_batch(spark, M_B1), "b0")
        merge_mor(ctl, m_batch(spark, M_B2), "b1")
        assert table_sha256(t.read_live()) == table_sha256(ctl.read_live())


class TestWapCli:
    def test_publish_discard_status(self, spark, tmp_path, capsys):
        t = _base(spark, tmp_path)
        merge_upsert(t, batch_df(spark, B2), "b2", publish=False)
        sid = t.staged_snapshots()[0]

        assert main(["cdc-status", "--table", t.path]) == 0
        assert json.loads(capsys.readouterr().out)["staged_snapshots"] == [sid]

        assert main(["cdc-publish", "--table", t.path]) == 0  # oldest staged
        out = json.loads(capsys.readouterr().out)
        assert out["published"] == sid and out["commit_id"] == "b2"

        assert main(["cdc-publish", "--table", t.path]) == 1
        assert "no staged" in capsys.readouterr().err

        merge_upsert(t, batch_df(spark, B3), "b3", publish=False)
        sid3 = t.staged_snapshots()[0]
        assert main(["cdc-discard", "--table", t.path,
                     "--snapshot", str(sid3)]) == 0
        assert json.loads(capsys.readouterr().out) == {"discarded": sid3}
        assert main(["cdc-discard", "--table", t.path,
                     "--snapshot", str(sid)]) == 1  # published, not staged
        assert "not staged" in capsys.readouterr().err
