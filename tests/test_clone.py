"""Shallow clone (lake/clone.py + cdc-clone CLI).

Load-bearing properties:
- a clone is digest-identical to the source at the cloned snapshot and
  contains ZERO data files of its own (pure metadata);
- writes diverge independently in both directions (COW buckets land in the
  writer's own tree, the other table's digest is unchanged);
- expiry on the CLONE never deletes source-owned (absolute-path) files —
  the ownership rule added in lake/expire.py;
- stats/bloom skipping and MOR masks survive the clone (entries copied
  verbatim, paths absolutized).
"""
import glob
import json
import os

from table2qb_spark.cdc.verify import table_sha256
from table2qb_spark.lake.clone import clone_table
from table2qb_spark.lake.expire import expire_snapshots
from table2qb_spark.lake.merge import merge_upsert
from table2qb_spark.lake.table import LakeTable
from table2qb_spark.main import main
from tests.test_rollback import batch_df, three_batches

import pytest


def _own_parquet(table_path):
    return glob.glob(os.path.join(table_path, "data", "**", "*.parquet"),
                     recursive=True)


class TestClone:
    def test_clone_is_zero_copy_and_identical(self, spark, tmp_path):
        t, _ = three_batches(spark, tmp_path)
        dest = str(tmp_path / "fork")
        r = clone_table(spark, t.path, dest)
        assert r["referenced_data_files"] > 0
        c = LakeTable(spark, dest)
        assert table_sha256(c.read()) == table_sha256(t.read())
        assert _own_parquet(dest) == []  # no data copied
        # schema, keys, bucket layout carried over
        s = c.snapshot()
        assert s.key_columns == ["repo", "path"]
        assert s.summary["operation"] == "clone"

    def test_clone_at_older_snapshot(self, spark, tmp_path):
        t, sid_b1 = three_batches(spark, tmp_path)
        dest = str(tmp_path / "fork")
        clone_table(spark, t.path, dest, snapshot_ref=sid_b1)
        c = LakeTable(spark, dest)
        assert table_sha256(c.read()) == table_sha256(
            t.read(snapshot_id=sid_b1)
        )

    def test_divergence_is_independent(self, spark, tmp_path):
        t, _ = three_batches(spark, tmp_path)
        dest = str(tmp_path / "fork")
        clone_table(spark, t.path, dest)
        c = LakeTable(spark, dest)
        src_digest = table_sha256(t.read())

        merge_upsert(c, batch_df(spark, [
            (10, "I", "r9", "z.py", "c9", "py", "fork-only"),
        ]), "fork-b1")
        assert table_sha256(t.read()) == src_digest  # source untouched
        assert c.read().where("repo = 'r9'").count() == 1
        assert len(_own_parquet(dest)) > 0  # COW bucket landed locally

        merge_upsert(t, batch_df(spark, [
            (11, "I", "r8", "y.py", "c8", "go", "src-only"),
        ]), "src-b4")
        assert c.read().where("repo = 'r8'").count() == 0

    def test_clone_expire_never_deletes_source_files(self, spark, tmp_path):
        t, _ = three_batches(spark, tmp_path)
        dest = str(tmp_path / "fork")
        clone_table(spark, t.path, dest)
        c = LakeTable(spark, dest)
        src_files = set(_own_parquet(t.path))
        src_digest = table_sha256(t.read())

        # diverge every key's bucket, then expire the clone hard
        merge_upsert(c, batch_df(spark, [
            (10, "U", "r1", "a.py", "cX", "py", "fork-v3"),
            (11, "U", "r3", "c.py", "cY", "rs", "fork-v2"),
            (12, "I", "r9", "z.py", "c9", "py", "fork-only"),
        ]), "fork-b1")
        os.environ["SPARK_GRAFT_ORPHAN_GRACE_SEC"] = "0"
        try:
            expire_snapshots(c, keep_last=1)
        finally:
            del os.environ["SPARK_GRAFT_ORPHAN_GRACE_SEC"]
        assert set(_own_parquet(t.path)) == src_files
        assert table_sha256(t.read()) == src_digest
        assert c.read().where("content = 'fork-v3'").count() == 1

    def test_exactly_once_domain_is_fresh(self, spark, tmp_path):
        # replaying a commit id already applied to the SOURCE re-applies on
        # the clone (fork = new exactly-once domain, no markers copied)
        t, _ = three_batches(spark, tmp_path)
        dest = str(tmp_path / "fork")
        clone_table(spark, t.path, dest)
        c = LakeTable(spark, dest)
        r = merge_upsert(c, batch_df(spark, [
            (20, "U", "r1", "a.py", "cZ", "py", "reapplied"),
        ]), "b2")  # "b2" was applied to the source already
        assert r is not None
        assert c.read().where("content = 'reapplied'").count() == 1

    def test_cli_and_guards(self, spark, tmp_path, capsys):
        t, sid_b1 = three_batches(spark, tmp_path)
        t.create_tag("v1", snapshot_id=sid_b1)
        dest = str(tmp_path / "fork")
        assert main(["cdc-clone", "--source", t.path, "--dest", dest,
                     "--snapshot", "v1"]) == 0
        out = json.loads(capsys.readouterr().out)
        assert out["source_snapshot"] == sid_b1
        # destination-exists guard
        assert main(["cdc-clone", "--source", t.path, "--dest", dest]) == 1
        assert "already exists" in capsys.readouterr().err

    def test_clone_of_clone(self, spark, tmp_path):
        t, _ = three_batches(spark, tmp_path)
        d1, d2 = str(tmp_path / "f1"), str(tmp_path / "f2")
        clone_table(spark, t.path, d1)
        c1 = LakeTable(spark, d1)
        merge_upsert(c1, batch_df(spark, [
            (30, "I", "r7", "w.py", "c7", "js", "gen1"),
        ]), "g1")
        clone_table(spark, d1, d2)  # absolute paths pass through untouched
        c2 = LakeTable(spark, d2)
        assert table_sha256(c2.read()) == table_sha256(c1.read())
        assert _own_parquet(d2) == []
