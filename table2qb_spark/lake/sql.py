"""Ad-hoc SQL over lake tables: register snapshots as temp views, query.

The lake's read surfaces are all TASK-shaped (export, diff, lookup, prep) —
but an operator debugging a 100 TB corpus wants the warehouse move: "join
the current state against last week's tag and count what changed per
lang". ``cdc-sql`` is that face: each ``--table name=DIR[@REF]`` registers
a (masked, time-travelable) ``LakeTable.read()`` as temp view ``name``,
plus the table's metadata as ``name_files`` / ``name_snapshots`` /
``name_refs`` / ``name_properties`` (Iceberg's ``t.files`` metadata-table
idiom re-expressed as view suffixes — valid identifiers everywhere), then
runs one Spark SQL statement over them.

Scale shape: a view IS its DataFrame plan, so Catalyst pushes the query's
filters and column prunes straight through into the parquet scans
(predicate pushdown + ReadSchema pruning are free); MOR masks and schema
version mapping come from ``read()`` unchanged. What SQL-over-views cannot
reach is the lake's MANIFEST-level file skipping — that prune happens at
plan-build time inside ``read(where=...)``, before Catalyst exists — so
``--where name=PRED`` threads a simple-conjunction predicate into the
registration for point-ish queries over big tables (same grammar as
``cdc-export --where``; the SQL still re-applies its own WHERE, results
are never affected, only dead I/O). Joins between registered views are
ordinary Spark joins: AQE broadcasts small sides and handles skew.

Reference analog: none (table2qb has no queryable store; SURVEY.md §1) —
north-rule lake surface, Iceberg/Trino ``SELECT ... FROM t / t$files``
parity.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from table2qb_spark.lake.table import LakeTable

_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

#: metadata-view suffixes registered per table (Iceberg metadata tables)
META_SUFFIXES = ("files", "snapshots", "refs", "properties")


def parse_table_spec(spec: str) -> tuple[str, str, "str | None"]:
    """``name=DIR[@REF]`` -> (name, dir, ref|None).

    REF (a snapshot id or tag, resolved by ``LakeTable.resolve_ref``) is
    split on the LAST ``@`` — but only when the candidate ref contains no
    path separator, so directories with literal ``@`` in them stay intact.
    """
    name, eq, path = spec.partition("=")
    if not eq or not name or not path:
        raise ValueError(
            f"bad --table spec {spec!r}: expected name=DIR or name=DIR@REF"
        )
    if not _NAME_RE.match(name):
        raise ValueError(
            f"bad view name {name!r}: must be a SQL identifier "
            "([A-Za-z_][A-Za-z0-9_]*)"
        )
    ref: "str | None" = None
    if "@" in path:
        head, _, tail = path.rpartition("@")
        if tail and "/" not in tail:
            path, ref = head, tail
    return name, path, ref


def register_lake_views(
    spark: SparkSession,
    specs: "list[str]",
    where: "dict[str, str] | None" = None,
) -> dict[str, DataFrame]:
    """Register each ``name=DIR[@REF]`` spec as temp views ``name`` +
    ``name_<meta>`` for each metadata suffix; returns {view_name: df}.

    Collisions are user errors, not silent shadowing: duplicate names and
    data-view names that collide with another table's metadata views raise.
    """
    from table2qb_spark.lake import inspect as meta

    where = dict(where or {})
    registered: dict[str, DataFrame] = {}

    def _register(view: str, df: DataFrame) -> None:
        if view in registered:
            raise ValueError(f"duplicate view name {view!r}")
        df.createOrReplaceTempView(view)
        registered[view] = df

    for spec in specs:
        name, path, ref = parse_table_spec(spec)
        if not LakeTable.exists(path):
            raise ValueError(f"no lake table at {path} (run cdc-init first)")
        t = LakeTable(spark, path)
        sid = t.resolve_ref(ref) if ref is not None else None
        _register(
            name,
            t.read(snapshot_id=sid, where=where.pop(name, None)),
        )
        _register(f"{name}_files", meta.files_df(t, ref))
        _register(f"{name}_snapshots", meta.snapshots_df(t))
        _register(f"{name}_refs", meta.refs_df(t))
        _register(f"{name}_properties", meta.properties_df(t))
    if where:
        raise ValueError(
            f"--where names unknown table(s): {sorted(where)} "
            f"(registered: {sorted(registered)})"
        )
    return registered
