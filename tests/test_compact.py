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
