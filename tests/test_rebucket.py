"""Bucket-count evolution (lake/rebucket.py + cdc-rebucket CLI).

Reference analog: Iceberg partition-spec evolution — pinned against our own
invariants: state is byte-identical through the rewrite (order-insensitive
sha), historical snapshots keep their OWN layout (time travel), subsequent
merges route by the new count and converge to the same state a never-
rebucketed control table reaches, and merge-on-read delete debt folds away
in the rewrite like a compaction.
"""
import json

import pytest

from table2qb_spark.cdc.verify import table_sha256
from table2qb_spark.lake.merge import merge_upsert
from table2qb_spark.lake.rebucket import rebucket
from table2qb_spark.lake.table import key_bucket_expr
from table2qb_spark.main import main
from tests.test_mor import B1, B2, B3, batch, delete_files, mk
from tests.test_mor import merge_mor
from tests.test_rollback import batch_df, make_table

B4 = [
    (6, "U", "r1", "a.py", "c6", "py", "v3"),
    (7, "I", "r4", "d.py", "c7", "py", "v1"),
]


class TestRebucket:
    def test_state_identical_and_layout_changed(self, spark, tmp_path):
        t, _ = _filled(spark, tmp_path)
        sha = table_sha256(t.read())
        res = rebucket(t, 32)
        assert not res["skipped"]
        assert (res["n_buckets_before"], res["n_buckets_after"]) == (8, 32)
        snap = t.snapshot()
        assert snap.n_buckets == 32
        assert table_sha256(t.read()) == sha
        assert t.row_count() == t.read().count()
        # every file really lives in its declared NEW bucket
        for b in snap.files:
            got = (
                t.read(buckets=[int(b)])
                .withColumn("__b", key_bucket_expr(snap.key_columns, 32))
                .select("__b").distinct().collect()
            )
            assert {r["__b"] for r in got} <= {int(b)}

    def test_downsize_and_same_count_skip(self, spark, tmp_path):
        t, _ = _filled(spark, tmp_path)
        sha = table_sha256(t.read())
        assert not rebucket(t, 2)["skipped"]
        assert t.snapshot().n_buckets == 2
        assert table_sha256(t.read()) == sha
        assert rebucket(t, 2)["skipped"]  # already at the target count

    def test_time_travel_keeps_old_layout(self, spark, tmp_path):
        t, sid_before = _filled(spark, tmp_path)
        sha_before = table_sha256(t.read(snapshot_id=sid_before))
        rebucket(t, 32)
        old = t.snapshot(sid_before)
        assert old.n_buckets == 8  # the historical header is untouched
        assert table_sha256(t.read(snapshot_id=sid_before)) == sha_before

    def test_merges_after_rebucket_converge_with_control(self, spark, tmp_path):
        t, _ = _filled(spark, tmp_path)
        rebucket(t, 32)
        merge_upsert(t, batch_df(spark, B4), "b4")

        control = make_table(spark, tmp_path / "ctl")
        for i, rows in enumerate(
            [_B1_ROLL, _B2_ROLL, _B3_ROLL, B4]
        ):
            merge_upsert(control, batch_df(spark, rows), f"b{i + 1}")
        assert table_sha256(t.read()) == table_sha256(control.read())

    def test_mor_debt_folds_away(self, spark, tmp_path):
        t = mk(spark, tmp_path, "t")
        for i, rows in enumerate([B1, B2, B3]):
            merge_mor(t, batch(spark, rows), f"b{i}")
        sha = table_sha256(t.read_live())
        assert delete_files(t) > 0
        rebucket(t, 16)
        assert delete_files(t) == 0  # rewrite is a compaction too
        assert table_sha256(t.read_live()) == sha

    def test_cli(self, spark, tmp_path, capsys):
        t, _ = _filled(spark, tmp_path)
        sha = table_sha256(t.read())
        assert main(["cdc-rebucket", "--table", t.path, "--buckets", "16"]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["n_buckets_after"] == 16
        assert table_sha256(t.read()) == sha
        assert main(["cdc-rebucket", "--table", t.path, "--buckets", "0"]) == 1
        assert "n_buckets" in capsys.readouterr().err


_B1_ROLL = [
    (1, "I", "r1", "a.py", "c1", "py", "v1"),
    (2, "I", "r2", "b.py", "c2", "go", "v1"),
]
_B2_ROLL = [
    (3, "U", "r1", "a.py", "c3", "py", "v2"),
    (4, "I", "r3", "c.py", "c4", "rs", "v1"),
]
_B3_ROLL = [
    (5, "D", "r2", "b.py", None, None, None),
]


def _filled(spark, tmp_path):
    """An 8-bucket COW table with inserts/updates/a delete applied."""
    t = make_table(spark, tmp_path)
    for i, rows in enumerate([_B1_ROLL, _B2_ROLL, _B3_ROLL]):
        merge_upsert(t, batch_df(spark, rows), f"b{i + 1}")
        if i == 0:
            sid = t.current_snapshot_id()
    return t, sid
