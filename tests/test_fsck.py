"""cdc-fsck integrity checker: clean tables pass, each corruption class is
detected, expected debris (orphans, staged) stays warning-grade."""

import json
import os

import pytest
from pyspark.sql import functions as F

from table2qb_spark.lake.fsck import fsck
from table2qb_spark.lake.table import LakeTable, key_bucket_expr

SCHEMA = [("repo", "string"), ("path", "string"), ("content", "string")]
KEYS = ["repo", "path"]


def _make(spark, path, n=300):
    t = LakeTable.create(spark, str(path), SCHEMA, KEYS, n_buckets=4)
    df = spark.range(n).select(
        F.concat(F.lit("r"), (F.col("id") % 7).cast("string")).alias("repo"),
        F.concat(F.lit("f"), F.col("id").cast("string")).alias("path"),
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("content"),
    ).withColumn("__bucket", key_bucket_expr(KEYS, 4))
    files = t.write_data_files(df, "c1")
    t.commit_files("c1", list(files), files)
    return t


def test_clean_table_passes(spark, tmp_path):
    t = _make(spark, tmp_path / "t")
    r = fsck(t)
    assert r["ok"] and r["errors"] == []
    assert r["checked"]["data_files"] > 0
    assert r["checked"]["orphan_data_files"] == 0


def test_deep_clean_and_tampered_entry_rows(spark, tmp_path):
    t = _make(spark, tmp_path / "t")
    assert fsck(t, deep=True)["ok"]
    # tamper one bucket manifest: entry rows + pointer rows shift together,
    # so the metadata arithmetic stays consistent — only --deep catches it
    snap = t.snapshot()
    b, ptr = next(iter(snap.manifest_pointers.items()))
    bm = os.path.join(t.path, ptr["path"])
    doc = json.load(open(bm))
    doc["files"][0]["rows"] += 5
    open(bm, "w").write(json.dumps(doc))
    ml = os.path.join(t.path, t._read_header(snap.snapshot_id)["manifest"])
    mdoc = json.load(open(ml))
    mdoc["buckets"][b]["rows"] += 5
    open(ml, "w").write(json.dumps(mdoc))
    shallow = fsck(t)
    assert shallow["ok"]  # consistent lie: shallow cannot see it
    deep = fsck(t, deep=True)
    assert not deep["ok"]
    assert any("physical rows" in e for e in deep["errors"])


def test_missing_data_file_detected(spark, tmp_path):
    t = _make(spark, tmp_path / "t")
    snap = t.snapshot()
    victim = next(e["path"] for b in snap.files for e in snap.files[b])
    os.remove(os.path.join(t.path, victim))
    r = fsck(t)
    assert not r["ok"]
    assert any(victim in e and "missing" in e for e in r["errors"])


def test_pointer_live_rows_mismatch_detected(spark, tmp_path):
    t = _make(spark, tmp_path / "t")
    snap = t.snapshot()
    ml = os.path.join(t.path, t._read_header(snap.snapshot_id)["manifest"])
    doc = json.load(open(ml))
    b = next(iter(doc["buckets"]))
    doc["buckets"][b]["rows"] += 1
    open(ml, "w").write(json.dumps(doc))
    r = fsck(t)
    assert not r["ok"]
    assert any("live rows" in e for e in r["errors"])


def test_orphan_is_warning_not_error(spark, tmp_path):
    t = _make(spark, tmp_path / "t")
    stray_dir = os.path.join(t.path, "data", "snap-lost-attempt", "b=0")
    os.makedirs(stray_dir)
    with open(os.path.join(stray_dir, "part-junk.parquet"), "wb") as f:
        f.write(b"not parquet")
    r = fsck(t)
    assert r["ok"]
    assert r["checked"]["orphan_data_files"] == 1
    assert any("orphan" in w for w in r["warnings"])


def test_staged_snapshot_is_warning(spark, tmp_path):
    t = _make(spark, tmp_path / "t")
    df = spark.range(10).select(
        F.lit("rX").alias("repo"),
        F.concat(F.lit("g"), F.col("id").cast("string")).alias("path"),
        F.lit("x").alias("content"),
    ).withColumn("__bucket", key_bucket_expr(KEYS, 4))
    files = t.write_data_files(df, "staged")
    t.commit_files("c-staged", list(files), files, publish=False)
    r = fsck(t)
    assert r["ok"] and r["checked"]["staged"] == 1
    assert any("staged" in w for w in r["warnings"])


def test_cli_exit_codes(spark, tmp_path, capsys):
    from table2qb_spark.main import main

    t = _make(spark, tmp_path / "t")
    assert main(["cdc-fsck", "--table", t.path]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["ok"]
    snap = t.snapshot()
    victim = next(e["path"] for b in snap.files for e in snap.files[b])
    os.remove(os.path.join(t.path, victim))
    assert main(["cdc-fsck", "--table", t.path]) == 1
