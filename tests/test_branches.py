"""Writable branch refs (Iceberg branches): commit chains staged off main,
fast-forward publish, CAS-advanced heads.

Generalizes the WAP single-staged-snapshot flow (tests/test_wap.py) to
chains: branch commits read the BRANCH state and are invisible on main;
fast_forward publishes the chain stepwise (each step the proven direct
publish sequence) and writes the commit markers (exactly-once decided at
fast-forward); a branch whose base was overtaken by main is rejected.
Reference analog: Iceberg branch refs + fast-forward (the audit-branch
pattern its docs recommend for WAP over multiple commits).
"""
import json

import pytest

from table2qb_spark.cdc.verify import table_sha256
from table2qb_spark.lake.merge import merge_upsert
from table2qb_spark.lake.table import ConcurrentCommitError, LakeTable
from table2qb_spark.main import main
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


class TestBranchRefs:
    def test_create_list_delete_resolve(self, spark, tmp_path):
        t = _base(spark, tmp_path)
        doc = t.create_branch("audit")
        assert doc["type"] == "branch"
        assert t.branch_head("audit") == t.current_snapshot_id()
        assert t.resolve_ref("audit") == t.current_snapshot_id()
        with pytest.raises(ValueError, match="already exists"):
            t.create_branch("audit")
        # a tag is not a branch
        t.create_tag("pin")
        with pytest.raises(ValueError, match="tag, not a branch"):
            t.branch_head("pin")
        t.delete_branch("audit")
        with pytest.raises(ValueError, match="no such ref"):
            t.branch_head("audit")

    def test_branch_commits_invisible_on_main_and_chain_reads(
        self, spark, tmp_path
    ):
        t = _base(spark, tmp_path)
        sha_main = table_sha256(t.read())
        cur = t.current_snapshot_id()
        t.create_branch("audit")

        merge_upsert(t, batch_df(spark, B2), "b2", branch="audit")
        merge_upsert(t, batch_df(spark, B3), "b3", branch="audit")
        # main unmoved, no markers, WAP staged list empty (branch-owned)
        assert t.current_snapshot_id() == cur
        assert table_sha256(t.read()) == sha_main
        assert not t.has_commit("b2") and not t.has_commit("b3")
        assert t.staged_snapshots() == []
        # the second branch commit read the FIRST one's state: r1 updated
        # by b2 then r2 deleted by b3 are both visible at the head
        head = t.read(snapshot_id=t.branch_head("audit"))
        assert head.where("repo = 'r2'").count() == 0
        assert head.where("repo = 'r1' and commit = 'c3'").count() == 1
        assert len(t.branch_chain("audit")) == 2

    def test_fast_forward_matches_direct_commits(self, spark, tmp_path):
        t = _base(spark, tmp_path, "br")
        t.create_branch("audit")
        merge_upsert(t, batch_df(spark, B2), "b2", branch="audit")
        merge_upsert(t, batch_df(spark, B3), "b3", branch="audit")
        snap = t.fast_forward("audit")
        assert t.current_snapshot_id() == snap.snapshot_id
        assert t.has_commit("b2") and t.has_commit("b3")
        # published headers are clean (no staged/branch residue)
        for sid in (snap.snapshot_id, snap.parent_id):
            h = t._read_header(sid)
            assert "staged" not in h and "branch" not in h

        ctl = _base(spark, tmp_path, "ctl")
        merge_upsert(ctl, batch_df(spark, B2), "b2")
        merge_upsert(ctl, batch_df(spark, B3), "b3")
        assert table_sha256(t.read()) == table_sha256(ctl.read())
        # replay after fast-forward: exactly-once holds
        assert merge_upsert(t, batch_df(spark, B2), "b2")["skipped"]

    def test_ff_rejected_when_main_moved(self, spark, tmp_path):
        t = _base(spark, tmp_path)
        t.create_branch("audit")
        merge_upsert(t, batch_df(spark, B2), "b2", branch="audit")
        merge_upsert(t, batch_df(spark, B3), "b3")  # interleaved main commit
        with pytest.raises(ConcurrentCommitError, match="re-branch"):
            t.fast_forward("audit")
        # the branch itself is still auditable and discardable
        assert t.read(snapshot_id=t.branch_head("audit")).count() == 3
        t.delete_branch("audit")
        # discarded chain's commit replays cleanly on main
        assert not merge_upsert(t, batch_df(spark, B2), "b2")["skipped"]

    def test_branch_scoped_exactly_once(self, spark, tmp_path):
        t = _base(spark, tmp_path)
        t.create_branch("audit")
        merge_upsert(t, batch_df(spark, B2), "b2", branch="audit")
        assert merge_upsert(t, batch_df(spark, B2), "b2", branch="audit")[
            "skipped"
        ]
        assert len(t.branch_chain("audit")) == 1

    def test_advance_cas_rejects_stale_head(self, spark, tmp_path):
        t = _base(spark, tmp_path)
        t.create_branch("audit")
        head = t.branch_head("audit")
        merge_upsert(t, batch_df(spark, B2), "b2", branch="audit")
        with pytest.raises(ConcurrentCommitError, match="moved"):
            t._advance_branch("audit", head, head + 7)

    def test_pending_branch_never_blocks_main(self, spark, tmp_path):
        # a main commit landing while a branch holds the next id slot takes
        # the following free slot (branch-owned slots are skipped, never
        # clobbered) — a pending branch must not stall ingest
        t = _base(spark, tmp_path)
        t.create_branch("audit")
        merge_upsert(t, batch_df(spark, B2), "b2", branch="audit")
        branch_sid = t.branch_head("audit")
        merge_upsert(t, batch_df(spark, B3), "b3")  # succeeds, skips the slot
        assert t.current_snapshot_id() > branch_sid
        assert t.has_commit("b3")
        # the branch header survived and is still auditable; its ff is now
        # (correctly) rejected because main moved past its base
        assert t._read_header(branch_sid).get("branch") == "audit"
        assert t.read(snapshot_id=branch_sid).count() == 3
        with pytest.raises(ConcurrentCommitError, match="re-branch"):
            t.fast_forward("audit")


class TestBranchCLI:
    def test_create_list_ff_delete(self, spark, tmp_path, capsys):
        t = _base(spark, tmp_path)
        tdir = str(t.path)
        assert main(["cdc-branch", "--table", tdir, "--create", "audit"]) == 0
        doc = json.loads(capsys.readouterr().out)
        assert doc["type"] == "branch"
        merge_upsert(t, batch_df(spark, B2), "b2", branch="audit")

        assert main(["cdc-branch", "--table", tdir]) == 0
        listed = json.loads(capsys.readouterr().out)
        assert listed["audit"]["chain"] == [t.branch_head("audit")]

        assert main(["cdc-branch", "--table", tdir, "--ff", "audit"]) == 0
        out = json.loads(capsys.readouterr().out)
        assert out["snapshot_id"] == t.current_snapshot_id()
        assert t.has_commit("b2")

        assert main(["cdc-branch", "--table", tdir, "--delete", "audit"]) == 0
        capsys.readouterr()

    def test_ff_error_exit_code(self, spark, tmp_path, capsys):
        t = _base(spark, tmp_path)
        tdir = str(t.path)
        t.create_branch("audit")
        merge_upsert(t, batch_df(spark, B2), "b2", branch="audit")
        merge_upsert(t, batch_df(spark, B3), "b3")
        assert main(["cdc-branch", "--table", tdir, "--ff", "audit"]) == 1
        assert "re-branch" in capsys.readouterr().err


class TestBranchMergeOnRead:
    def test_mor_branch_commit_and_ff(self, spark, tmp_path):
        from table2qb_spark.lake.mor import merge_mor
        from tests.test_mor import B1 as M_B1
        from tests.test_mor import B2 as M_B2
        from tests.test_mor import batch as m_batch
        from tests.test_mor import mk as m_mk

        t = m_mk(spark, tmp_path, "mor")
        merge_mor(t, m_batch(spark, M_B1), "m1")
        cur = t.current_snapshot_id()
        t.create_branch("audit")
        merge_mor(t, m_batch(spark, M_B2), "m2", branch="audit")
        assert t.current_snapshot_id() == cur  # invisible on main
        # branch head carries the MOR result: a.py updated, b.py tombstoned
        head = t.read_live(snapshot_id=t.branch_head("audit"))
        got = {(r["repo"], r["path"]): r["content"] for r in head.collect()}
        assert got[("r1", "a.py")] == "a2"
        assert ("r1", "b.py") not in got
        # idempotent on the branch
        assert merge_mor(t, m_batch(spark, M_B2), "m2", branch="audit")[
            "skipped"
        ]
        t.fast_forward("audit")
        ctl = m_mk(spark, tmp_path, "ctl")
        from table2qb_spark.cdc.verify import table_sha256

        merge_mor(ctl, m_batch(spark, M_B1), "m1")
        merge_mor(ctl, m_batch(spark, M_B2), "m2")
        assert table_sha256(t.read_live()) == table_sha256(ctl.read_live())
