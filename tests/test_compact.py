"""Compaction: file-count reduction, tombstone purge below the watermark,
state preservation, idempotency."""

from pyspark.sql import functions as F

from table2qb_spark.cdc.streaming import create_stream_table
from table2qb_spark.cdc.verify import table_sha256
from table2qb_spark.lake.compact import compact
from table2qb_spark.lake.merge import merge_upsert
from table2qb_spark.lake.table import LakeTable

SCHEMA = [("repo", "string"), ("path", "string"), ("content", "string")]
KEYS = ["repo", "path"]


def batch(spark, rows):
    return spark.createDataFrame(
        rows, "seq long, op string, repo string, path string, content string"
    )


def test_compact_preserves_state_and_is_idempotent(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, n_buckets=2)
    # several merges -> multiple file generations per bucket
    for i in range(3):
        rows = [(i * 10 + j, "I", f"r{j % 3}", f"f{i}_{j}.py", f"v{i}{j}") for j in range(6)]
        merge_upsert(t, batch(spark, rows), f"b{i}", batch_size_hint=1)
    sha_before = table_sha256(t.read())
    # bucket-level COW means merges never leave multiple files per bucket —
    # default compaction finds nothing to do (a feature, asserted here)
    assert compact(t)["skipped"]
    # forced rewrite (min_files=1) preserves state exactly
    res = compact(t, min_files=1)
    assert not res["skipped"]
    assert res["files_after"] <= res["files_before"]
    assert table_sha256(t.read()) == sha_before
    # steady state: default compaction still finds nothing (1 file/bucket)
    assert compact(t)["skipped"]


def test_compact_purges_tombstones_below_watermark(spark, tmp_path):
    t = create_stream_table(spark, str(tmp_path / "t"), SCHEMA, KEYS, n_buckets=2)
    merge_upsert(t, batch(spark, [
        (1, "I", "r1", "a.py", "v1"),
        (2, "I", "r1", "b.py", "v1"),
    ]), "b1")
    merge_upsert(t, batch(spark, [
        (3, "D", "r1", "a.py", None),
        (9, "D", "r1", "b.py", None),
    ]), "b2")
    assert t.read().where(F.col("_deleted")).count() == 2
    assert t.read_live().count() == 0
    # purge only tombstones with _seq <= 5: a.py (seq 3) goes, b.py (seq 9) stays
    compact(t, purge_below_seq=5, min_files=1)
    remaining = t.read().where(F.col("_deleted")).collect()
    assert [r["path"] for r in remaining] == ["b.py"]
    # late event below the watermark for the purged key would re-insert —
    # which is exactly why purge requires the global applied watermark;
    # above-watermark late events still behave (seq 4 < b.py's 9: stays dead)
    merge_upsert(t, batch(spark, [(4, "U", "r1", "b.py", "late")]), "b3")
    assert t.read_live().count() == 0


class TestExpireSnapshots:
    def _commits(self, spark, tmp_path, n=4):
        from tests.test_lake_cdc import BASE_SCHEMA, KEYS, batch_df
        from table2qb_spark.lake.merge import merge_upsert
        from table2qb_spark.lake.table import LakeTable

        t = LakeTable.create(spark, str(tmp_path / "exp"), BASE_SCHEMA, KEYS, n_buckets=2)
        for i in range(1, n + 1):
            merge_upsert(
                t, batch_df(spark, [(i, "U", "r1", "a.py", f"c{i}", "py", f"v{i}")]), f"b{i}"
            )
        return t

    def test_expire_deletes_only_unreferenced(self, spark, tmp_path):
        import glob, os
        from table2qb_spark.lake.expire import expire_snapshots

        t = self._commits(spark, tmp_path, n=4)
        files_before = set(glob.glob(os.path.join(t.path, "data", "**", "*.parquet"), recursive=True))
        cur = t.current_snapshot_id()
        res = expire_snapshots(t, keep_last=2)
        assert res["expired_snapshots"] > 0 and res["deleted_data_files"] > 0
        files_after = set(glob.glob(os.path.join(t.path, "data", "**", "*.parquet"), recursive=True))
        assert files_after < files_before
        # current state fully readable and correct
        assert {r["content"] for r in t.read().collect()} == {"v4"}
        # retained ancestor still time-travels; expired one raises
        retained = sorted(res["retained"])
        assert t.read(snapshot_id=retained[0]).count() == 1
        expired_id = 1
        assert expired_id not in retained
        import pytest as _pytest
        with _pytest.raises(FileNotFoundError):
            t.snapshot(expired_id)
        # history stops at the oldest retained snapshot instead of crashing
        hist = t.history()
        assert [s.snapshot_id for s in hist][-1] == cur
        assert all(s.snapshot_id in retained for s in hist)

    def test_exactly_once_survives_expiry(self, spark, tmp_path):
        from tests.test_lake_cdc import batch_df
        from table2qb_spark.lake.expire import expire_snapshots
        from table2qb_spark.lake.merge import merge_upsert

        t = self._commits(spark, tmp_path, n=4)
        expire_snapshots(t, keep_last=1)
        # markers survive: redelivering a historic commit id still skips
        s = merge_upsert(
            t, batch_df(spark, [(1, "U", "r1", "a.py", "c1", "py", "STALE")]), "b1"
        )
        assert s.get("skipped")
        assert {r["content"] for r in t.read().collect()} == {"v4"}

    def test_expire_is_noop_when_everything_retained(self, spark, tmp_path):
        from table2qb_spark.lake.expire import expire_snapshots

        t = self._commits(spark, tmp_path, n=2)
        res = expire_snapshots(t, keep_last=10)
        assert res["expired_snapshots"] == 0 and res["deleted_data_files"] == 0


class TestSnapshotDiff:
    def test_diff_classifies_insert_update_delete(self, spark, tmp_path):
        from tests.test_lake_cdc import BASE_SCHEMA, KEYS, batch_df
        from table2qb_spark.lake.diff import changed_buckets, snapshot_diff
        from table2qb_spark.lake.merge import merge_upsert
        from table2qb_spark.lake.table import LakeTable

        t = LakeTable.create(spark, str(tmp_path / "d"), BASE_SCHEMA, KEYS, n_buckets=8)
        merge_upsert(
            t,
            batch_df(spark, [
                (1, "I", "r1", "a.py", "c", "py", "v1"),
                (2, "I", "r1", None, "c", "py", "nullkey-v1"),  # NULL key component
                (3, "I", "r2", "keep.py", "c", "py", "same"),
                (4, "I", "r3", "gone.py", "c", "py", "bye"),
            ]),
            "b1",
        )
        s1 = t.current_snapshot_id()
        merge_upsert(
            t,
            batch_df(spark, [
                (5, "U", "r1", "a.py", "c", "py", "v2"),          # update
                (6, "U", "r1", None, "c", "py", "nullkey-v2"),    # update on NULL key
                (7, "D", "r3", "gone.py", None, None, None),       # delete
                (8, "I", "r9", "new.py", "c", "py", "hello"),      # insert
            ]),
            "b2",
        )
        d = snapshot_diff(t, s1)
        got = {(r["change_type"], r["repo"], r["path"]): r["content"] for r in d.collect()}
        assert got == {
            ("update", "r1", "a.py"): "v2",
            ("update", "r1", None): "nullkey-v2",
            ("delete", "r3", "gone.py"): "bye",   # pre-image for deletes
            ("insert", "r9", "new.py"): "hello",
        }
        # unchanged keys never appear, and unchanged buckets are pruned by
        # metadata: the changed-bucket set excludes at least r2/keep.py's
        # bucket when it collides with no changed key
        cb = changed_buckets(t, s1, t.current_snapshot_id())
        assert 0 < len(cb) <= 8

    def test_diff_empty_between_identical_snapshots(self, spark, tmp_path):
        from tests.test_lake_cdc import BASE_SCHEMA, KEYS, batch_df
        from table2qb_spark.lake.diff import changed_buckets, snapshot_diff
        from table2qb_spark.lake.merge import merge_upsert
        from table2qb_spark.lake.table import LakeTable

        t = LakeTable.create(spark, str(tmp_path / "d2"), BASE_SCHEMA, KEYS, n_buckets=4)
        merge_upsert(t, batch_df(spark, [(1, "I", "r1", "a.py", "c", "py", "v1")]), "b1")
        sid = t.current_snapshot_id()
        t.evolve_schema(add_columns=[("license", "string")])  # metadata-only commit
        assert changed_buckets(t, sid, t.current_snapshot_id()) == []
        assert snapshot_diff(t, sid).count() == 0


def test_diff_across_compaction_is_empty(spark, tmp_path):
    """Compaction rewrites files (pointers change) without changing content:
    snapshot_diff must classify nothing."""
    from tests.test_lake_cdc import BASE_SCHEMA, KEYS, batch_df
    from table2qb_spark.lake.compact import compact
    from table2qb_spark.lake.diff import snapshot_diff
    from table2qb_spark.lake.merge import merge_upsert
    from table2qb_spark.lake.table import LakeTable

    t = LakeTable.create(spark, str(tmp_path / "dc"), BASE_SCHEMA, KEYS, n_buckets=2)
    merge_upsert(t, batch_df(spark, [(1, "I", "r1", "a.py", "c", "py", "v1")]), "b1")
    merge_upsert(t, batch_df(spark, [(2, "I", "r2", "b.py", "c", "py", "v2")]), "b2")
    sid = t.current_snapshot_id()
    res = compact(t, min_files=1)
    assert not res.get("skipped")
    assert snapshot_diff(t, sid).count() == 0


def test_expire_leaves_no_unreferenced_files(spark, tmp_path):
    """After expiry, every parquet file on disk is referenced by a retained
    snapshot and every retained snapshot is fully readable — even though the
    expired snapshots shared per-bucket manifests through pointer reuse
    (two-phase delete: resolve all references before removing anything)."""
    import glob, os
    from tests.test_lake_cdc import BASE_SCHEMA, KEYS, batch_df
    from table2qb_spark.lake.expire import expire_snapshots
    from table2qb_spark.lake.merge import merge_upsert
    from table2qb_spark.lake.table import LakeTable

    t = LakeTable.create(spark, str(tmp_path / "nl"), BASE_SCHEMA, KEYS, n_buckets=4)
    # seed both buckets, then repeatedly touch ONE key so snapshots share
    # the untouched buckets' manifests
    merge_upsert(t, batch_df(spark, [
        (i, "I", f"r{i}", f"f{i}.py", "c", "py", "v") for i in range(1, 9)
    ]), "seed")
    for i in range(2, 6):
        merge_upsert(
            t, batch_df(spark, [(10 * i, "U", "r1", "f1.py", "c", "py", f"v{i}")]),
            f"b{i}", batch_size_hint=1,
        )
    res = expire_snapshots(t, keep_last=2)
    assert res["expired_snapshots"] >= 3

    referenced = set()
    for sid in res["retained"]:
        try:
            snap = t.snapshot(sid)
        except FileNotFoundError:
            continue
        for b in snap.files:
            for e in snap.files[b]:  # every retained manifest must be readable
                referenced.add(os.path.normpath(os.path.join(t.path, e["path"])))
    on_disk = {
        os.path.normpath(f)
        for f in glob.glob(os.path.join(t.path, "data", "**", "*.parquet"), recursive=True)
    }
    assert referenced <= on_disk          # nothing referenced was deleted
    assert on_disk - referenced == set()  # nothing unreferenced leaked
    assert t.read().count() == 8


def test_expire_survives_crashed_prior_expiry(spark, tmp_path, monkeypatch):
    """A prior expiry that crashed after deleting a snapshot's manifests but
    before its header must not wedge future expiries: the header is dropped
    and the leftovers are swept."""
    import json as _json, os
    from tests.test_lake_cdc import BASE_SCHEMA, KEYS, batch_df
    from table2qb_spark.lake.expire import expire_snapshots
    from table2qb_spark.lake.merge import merge_upsert
    from table2qb_spark.lake.table import LakeTable

    t = LakeTable.create(spark, str(tmp_path / "cw"), BASE_SCHEMA, KEYS, n_buckets=2)
    for i in range(1, 5):
        merge_upsert(t, batch_df(spark, [(i, "U", "r1", "a.py", "c", "py", f"v{i}")]), f"b{i}")
    # simulate the crash: snapshot 2 (expired-to-be) loses its manifest list
    victim = 2
    rel = t._read_header(victim).get("manifest")
    os.remove(os.path.join(t.path, rel))
    monkeypatch.setenv("SPARK_GRAFT_ORPHAN_GRACE_SEC", "0")
    res = expire_snapshots(t, keep_last=2)
    assert res["expired_snapshots"] >= 2
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        t.snapshot(victim)  # header gone despite the missing manifest
    assert {r["content"] for r in t.read().collect()} == {"v4"}


def test_orphan_sweep_removes_losing_racers_files(spark, tmp_path, monkeypatch):
    """A ConcurrentCommitError loser's attempt-unique files are referenced
    by no header; the expiry sweep (grace=0) removes them even when no
    snapshot expires."""
    import glob, os
    from tests.test_lake_cdc import BASE_SCHEMA, KEYS, batch_df
    from table2qb_spark.lake.expire import expire_snapshots
    from table2qb_spark.lake.merge import merge_upsert
    from table2qb_spark.lake.table import ConcurrentCommitError, LakeTable, key_bucket_expr

    t = LakeTable.create(spark, str(tmp_path / "os"), BASE_SCHEMA, KEYS, n_buckets=2)
    merge_upsert(t, batch_df(spark, [(1, "I", "r1", "a.py", "c", "py", "v1")]), "seed")
    base = t.snapshot()
    df = batch_df(spark, [(2, "U", "r1", "a.py", "c", "py", "X")]).selectExpr(
        "repo", "path", "commit", "lang", "content"
    ).withColumn("__bucket", key_bucket_expr(KEYS, base.n_buckets))
    files_w = t.write_data_files(df, snapshot_hint="r")
    files_l = t.write_data_files(df, snapshot_hint="r")  # loser's files
    t.commit_files("w", sorted(files_w), files_w, {}, base_snapshot_id=base.snapshot_id)
    import pytest as _pytest
    with _pytest.raises(ConcurrentCommitError):
        t.commit_files("l", sorted(files_l), files_l, {}, base_snapshot_id=base.snapshot_id)
    n_before = len(glob.glob(os.path.join(t.path, "data", "**", "*.parquet"), recursive=True))
    monkeypatch.setenv("SPARK_GRAFT_ORPHAN_GRACE_SEC", "0")
    res = expire_snapshots(t, keep_last=100)  # nothing expires; sweep only
    assert res["expired_snapshots"] == 0 and res["swept_orphans"] > 0
    n_after = len(glob.glob(os.path.join(t.path, "data", "**", "*.parquet"), recursive=True))
    assert n_after < n_before
    assert {r["content"] for r in t.read().collect()} == {"X"}


def test_sorted_compaction_tightens_file_stats_for_skipping(spark, tmp_path):
    """compact(sort_by=..., max_records_per_file=...) rewrites each bucket as
    several files with DISJOINT sort-key ranges, so read(where=...) prunes at
    file granularity inside a bucket (the Iceberg sorted-compaction story)."""
    t = create_stream_table(spark, str(tmp_path / "t"), SCHEMA, KEYS, n_buckets=1)
    # 200 keys arriving in scattered seq order -> one unsorted file
    rows = [((i * 37) % 200 + 1, "I", "r", f"f{(i * 37) % 200}.py", f"v{i}")
            for i in range(200)]
    merge_upsert(t, batch(spark, rows), "b1", batch_size_hint=1)
    sha_before = table_sha256(t.read())

    res = compact(t, sort_by=["_seq"], max_records_per_file=50)
    assert not res["skipped"]
    assert res["files_after"] >= 4  # 200 rows split at 50/file
    assert table_sha256(t.read()) == sha_before  # state preserved exactly

    # manifest stats: the _seq ranges of the rewritten files are disjoint
    snap = t.snapshot()
    ranges = sorted(
        tuple(e["stats"]["_seq"]) for e in snap.files["0"] if "stats" in e
    )
    assert len(ranges) == res["files_after"]
    assert all(a[1] < b[0] for a, b in zip(ranges, ranges[1:]))

    # and read(where=) now prunes most files at plan time
    report = {}
    tail = t.read(where="_seq>=180", prune_report=report)
    assert report["files_total"] >= 4 and report["files_kept"] == 1
    assert tail.count() == 21  # seqs 180..200

    # re-running the sorted rewrite (new snapshot, new commit id) is a
    # state-level no-op; the commit summary records the cluster columns
    assert compact(t, sort_by=["_seq"], max_records_per_file=50)["skipped"] is False
    assert table_sha256(t.read()) == sha_before
    assert t.snapshot().summary.get("sort_by") == ["_seq"]
