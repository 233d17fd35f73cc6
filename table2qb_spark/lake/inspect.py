"""Metadata tables — the lake's own metadata exposed as DataFrames, the
Iceberg ``table.snapshots / table.files / table.refs`` inspection surface
re-expressed over this format.

Why DataFrames and not printed dicts: at 100 TB the *files* table is the
big one — 10^6+ entries spread over per-bucket manifest JSON files. It is
therefore read DISTRIBUTED (``spark.read.json`` over the snapshot's
manifest files, one Spark input split per manifest; the driver never holds
the file list), so operators can run real queries over it: "how many files
per bucket", "which buckets carry merge-on-read delete debt", "total rows
by schema version" — the same queries Iceberg users run over
``my_table.files``. Snapshot headers, refs and properties are O(commits) /
O(tags) driver-side JSON — tiny by construction (headers are O(1) per
commit; expire bounds their count) — and land in small local DataFrames.

The reference engine has no table format (single-pass CSV converter;
SURVEY.md reading guide) — this surface exists for the north rule's lake.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from table2qb_spark.lake.table import META_DIR, LakeTable

_SNAPSHOT_DDL = (
    "snapshot_id long, parent_id long, commit_id string, schema_version int, "
    "n_buckets int, n_commits long, row_count long, max_seq long, "
    "timestamp_ms long, staged boolean, operation string"
)

_FILES_DOC_DDL = (
    "files array<struct<path: string, schema_version: long, rows: long>>, "
    "delete_files array<struct<path: string, rows: long>>"
)

_REFS_DDL = "name string, snapshot_id long, created_ms long"


def snapshots_df(table: LakeTable) -> DataFrame:
    """One row per snapshot header (including staged/unpublished ones),
    ordered by snapshot_id. Driver-side read: headers are O(1) each and
    O(commits) total, with expiry bounding the retained count."""
    rows = []
    for p in sorted(glob.glob(os.path.join(table.path, META_DIR, "v*.json"))):
        with open(p) as f:
            d = json.load(f)
        summary = d.get("summary", {})
        op = "rollback" if "rollback_of" in summary else (
            "create" if d.get("parent_id") is None else "commit"
        )
        rows.append(
            (
                int(d["snapshot_id"]),
                d.get("parent_id"),
                d.get("commit_id"),
                int(d.get("schema_version", 1)),
                int(d.get("n_buckets", 0)),
                int(d.get("n_commits", 0)),
                summary.get("row_count"),
                summary.get("max_seq"),
                int(d.get("timestamp_ms", 0)),
                bool(d.get("staged", False)),
                op,
            )
        )
    return table.spark.createDataFrame(rows, StructType.fromDDL(_SNAPSHOT_DDL))


def files_df(table: LakeTable, snapshot_ref: "int | str | None" = None) -> DataFrame:
    """The snapshot's data + delete files as a DataFrame — DISTRIBUTED over
    the per-bucket manifest JSON files, so it scales to 10^6+ entries
    without driver materialization. Columns: bucket, content
    ('data'|'equality-deletes'), path, rows, schema_version, has_stats,
    has_bloom (a string-typed field in ``from_json`` captures the nested
    stats/bloom objects as raw JSON text, so presence costs no second
    read)."""
    sid = table.resolve_ref(snapshot_ref) if snapshot_ref is not None else None
    snap = table.snapshot(sid)
    pointers = snap.manifest_pointers or {}
    if not pointers:
        return table.spark.createDataFrame(
            [],
            StructType.fromDDL(
                "bucket int, content string, path string, rows long, "
                "schema_version long, has_stats boolean, has_bloom boolean"
            ),
        )
    paths = [os.path.join(table.path, p["path"]) for p in pointers.values()]
    raw = (
        table.spark.read.text(paths, wholetext=True)
        .select(
            F.regexp_extract(
                F.col("_metadata.file_path"), r"mb-\d+-[0-9a-f]+-(\d+)\.json", 1
            )
            .cast("int")
            .alias("bucket"),
            F.col("value"),
        )
    )
    doc_schema = (
        "files array<struct<path: string, schema_version: long, rows: long, "
        "stats: string, bloom: string>>, "
        "delete_files array<struct<path: string, rows: long>>, "
        "pos_delete_files array<struct<path: string, rows: long>>"
    )
    doc = raw.select("bucket", F.from_json("value", doc_schema).alias("d"))

    def _entries(kind: str, content: str) -> DataFrame:
        e = doc.select(
            "bucket", F.explode_outer(F.col(f"d.{kind}")).alias("e")
        ).where(F.col("e").isNotNull())
        has_stats = (
            F.col("e.stats").isNotNull() if kind == "files" else F.lit(False)
        )
        has_bloom = (
            F.col("e.bloom").isNotNull() if kind == "files" else F.lit(False)
        )
        sv = (
            F.col("e.schema_version") if kind == "files"
            else F.lit(None).cast("long")
        )
        return e.select(
            "bucket",
            F.lit(content).alias("content"),
            F.col("e.path").alias("path"),
            F.col("e.rows").alias("rows"),
            sv.alias("schema_version"),
            has_stats.alias("has_stats"),
            has_bloom.alias("has_bloom"),
        )

    return (
        _entries("files", "data")
        .unionByName(_entries("delete_files", "equality-deletes"))
        .unionByName(_entries("pos_delete_files", "position-deletes"))
    )


def refs_df(table: LakeTable) -> DataFrame:
    """Named snapshot refs (cdc-tag) as a DataFrame."""
    rows = [
        (name, int(d.get("snapshot_id")), d.get("created_ms"))
        for name, d in table.list_tags().items()
    ]
    return table.spark.createDataFrame(rows, StructType.fromDDL(_REFS_DDL))


def properties_df(table: LakeTable) -> DataFrame:
    """Current table properties as (key, value) rows."""
    snap = table.snapshot()
    rows = [(str(k), str(v)) for k, v in sorted(snap.properties.items())]
    return table.spark.createDataFrame(rows, StructType.fromDDL("key string, value string"))
