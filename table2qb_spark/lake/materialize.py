"""Incrementally-maintained materialized aggregate views
(``cdc-materialize``): keep ``SELECT <group>, count(*), sum(expr)... FROM
lake GROUP BY <group>`` continuously correct at O(changes) refresh cost —
the streaming-warehouse move (Materialize / Flink dynamic tables /
DBSP-style incremental view maintenance, public literature) built from
this lake's own parts.

Why it matters at 100 TB: corpus-level reports (docs and bytes per lang,
rows per repo, license mix) are re-read constantly but the corpus changes
by a trickle per commit. Recomputing the aggregate scans 100 TB; applying
the CHANGE is envelope-sized. Self-maintainable aggregates — ``count(*)``
and ``sum(expr)`` (avg = sum/count downstream) — update from deltas alone:
each changed row contributes ``+f(after)`` and ``-f(before)``; min/max are
NOT self-maintainable under deletes and are deliberately out of scope
(documented, a full refresh handles them).

The machinery is dogfooding, which is what makes exactly-once trivial:

- the VIEW is itself a ``LakeTable`` keyed on the group columns, so state
  merges inherit bucketed COW, snapshots, time travel and commit markers;
- the refresh DELTA comes from ``lake/cdf.py::changes_between`` over the
  SOURCE between the view's cursor and the source's current snapshot —
  change-sized when the source captures a change feed, else the
  bucket-pruned snapshot diff. One
  COALESCED diff is not an approximation here — net before/after is
  exactly the delta a linear aggregate needs (intermediate states cancel);
- the CURSOR rides in the refresh commit's own summary (``mv_cursor``),
  so state and cursor move in ONE atomic commit; the commit id is
  ``mv-refresh-<from>-<to>``, so a crashed/re-run refresh recomputes the
  same envelope and the view table's exactly-once marker skips the double
  apply. No side checkpoint files at all.
- a hidden ``__n = count(*)`` column is always maintained: a group whose
  ``__n`` reaches 0 is DELETED from the view (correct group death, the
  part naive incremental aggregation gets wrong).

Scale shape: the delta frame is envelope-sized (changed rows only) —
flatten after/before images, one groupBy over the group columns (map-side
combined), then an AQE-planned join against only the TOUCHED groups of the
state (the delta side is small; AQE broadcasts it). Refresh cost is
O(changes + touched groups), never O(table).

Float sums drift under long incremental chains (IEEE addition is not
associative) — integer sums are exact; ``full_refresh`` rebuilds from a
scan and also serves cursors expired past by ``cdc-expire``.

Reference analog: none (table2qb is one-shot batch ETL; SURVEY.md §1) —
north-rule derived-table surface over the CDC core.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame, SparkSession, functions as F

from table2qb_spark.lake.cdf import changes_between
from table2qb_spark.lake.merge import merge_upsert
from table2qb_spark.lake.table import LakeTable

#: hidden group-liveness count, always maintained
N_COL = "__n"

_AGG_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_]*)=(count|sum)\((.*)\)$")


def parse_aggs(specs: list[str]) -> list[dict]:
    """``name=count(*)`` / ``name=sum(<catalyst expr>)`` ->
    [{"name", "kind", "expr"}]. Names must be unique, not collide with
    the hidden count, and count takes only ``*``."""
    out, seen = [], set()
    for s in specs:
        m = _AGG_RE.match(s.strip())
        if not m:
            raise ValueError(
                f"bad --agg {s!r}: expected name=count(*) or name=sum(EXPR)"
            )
        name, kind, expr = m.groups()
        if kind == "count" and expr.strip() != "*":
            raise ValueError(f"bad --agg {s!r}: count supports only count(*)")
        if name in seen or name == N_COL:
            raise ValueError(f"duplicate/reserved agg name {name!r}")
        seen.add(name)
        out.append({"name": name, "kind": kind,
                    "expr": None if kind == "count" else expr.strip()})
    return out


def _agg_exprs(aggs: list[dict]):
    cols = [F.count(F.lit(1)).alias(N_COL)]
    for a in aggs:
        if a["kind"] == "count":
            cols.append(F.count(F.lit(1)).alias(a["name"]))
        else:
            cols.append(F.sum(F.expr(a["expr"])).alias(a["name"]))
    return cols


def full_aggregate(df: DataFrame, group: list[str], aggs: list[dict]) -> DataFrame:
    return df.groupBy(*[F.col(g) for g in group]).agg(*_agg_exprs(aggs))


def delta_frame(env: DataFrame, group: list[str], aggs: list[dict]) -> DataFrame:
    """Per-group NET contribution of an envelope: +f(after) for c/u/r rows,
    -f(before) for d/u rows, one union + one map-side-combined groupBy.
    NULL sum inputs contribute nothing on either side (SQL sum semantics,
    matching the full aggregate)."""
    def side(img: str, sign: int) -> DataFrame:
        ops = ("c", "u", "r") if sign > 0 else ("d", "u")
        flat = env.where(F.col("op").isin(*ops)).select(f"{img}.*")
        cols = [F.lit(sign).cast("long").alias(N_COL)]
        for a in aggs:
            if a["kind"] == "count":
                cols.append(F.lit(sign).cast("long").alias(a["name"]))
            else:
                cols.append((F.expr(a["expr"]) * sign).alias(a["name"]))
        return flat.select(*[F.col(g) for g in group], *cols)

    contrib = side("after", 1).unionByName(side("before", -1))
    names = [N_COL] + [a["name"] for a in aggs]
    return contrib.groupBy(*group).agg(
        *[F.sum(n).alias(n) for n in names]
    )


def _find_cursor(view: LakeTable) -> "int | None":
    """Latest ``mv_cursor`` in the view's ancestry (newest first) — later
    non-refresh commits to the view (compaction etc.) don't carry one."""
    for snap in reversed(view.history()):
        cur = snap.summary.get("mv_cursor")
        if cur is not None:
            return int(cur)
    return None


def _config_of(view: LakeTable) -> dict:
    props = view.snapshot().properties
    if "mv.source" not in props:
        raise ValueError(
            f"{view.path} is not a materialized view (no mv.* properties)"
        )
    return {
        "source": props["mv.source"],
        "group": json.loads(props["mv.group"]),
        "aggs": json.loads(props["mv.aggs"]),
    }


def _state_events(
    view: LakeTable, delta: DataFrame, group: list[str], names: list[str],
    seq: int,
) -> DataFrame:
    """Merge the delta into current state: new = old + delta per column,
    cast back to the state's bootstrap types; groups whose ``__n`` hits 0
    become deletes. The delta side is small (touched groups only) — AQE
    broadcasts it against the state scan."""
    types = {c["name"]: c["type"] for c in view.snapshot().current_schema()}
    state = view.read().alias("s")
    d = delta.alias("d")
    cond = [state[g].eqNullSafe(d[g]) for g in group]
    joined = d.join(state, cond, "left")
    new_cols = []
    for n in names:
        merged = F.coalesce(state[n], F.lit(0)) + F.coalesce(d[n], F.lit(0))
        new_cols.append(merged.cast(types[n]).alias(n))
    return joined.select(
        *[d[g].alias(g) for g in group], *new_cols,
    ).select(
        F.when(F.col(N_COL) <= 0, "D").otherwise("U").alias("op"),
        F.lit(seq).alias("seq"),
        "*",
    )


def create_view(
    spark: SparkSession,
    source_path: str,
    view_path: str,
    group: list[str],
    agg_specs: list[str],
    n_buckets: int = 16,
) -> dict:
    """Bootstrap: one full scan + groupBy of the source's CURRENT snapshot,
    stored as a fresh LakeTable keyed on the group columns; the view's
    config (source, group, aggs) persists in table properties and the
    source snapshot id in the commit summary (``mv_cursor``)."""
    if LakeTable.exists(view_path):
        raise ValueError(f"view already exists: {view_path}")
    aggs = parse_aggs(agg_specs)
    src = LakeTable(spark, source_path)
    sid = src.current_snapshot_id()
    agg_df = full_aggregate(src.read(snapshot_id=sid), group, aggs)
    schema = [(f.name, f.dataType.simpleString()) for f in agg_df.schema.fields]
    view = LakeTable.create(
        spark, view_path, schema, key_columns=group, n_buckets=n_buckets,
        properties={
            "mv.source": src.path,
            "mv.group": json.dumps(group),
            "mv.aggs": json.dumps(aggs),
        },
    )
    events = agg_df.select(
        F.lit("U").alias("op"), F.lit(sid).alias("seq"), "*"
    )
    merge_upsert(view, events, f"mv-bootstrap-{sid}",
                 summary_update={"mv_cursor": sid})
    return {"view": view.path, "source": src.path, "cursor": sid,
            "groups": int(view.snapshot().summary.get("row_count", 0) or 0),
            "bootstrap": True}


def refresh_view(spark: SparkSession, view_path: str,
                 full: bool = False) -> dict:
    """Incremental refresh: one coalesced envelope (cursor, current] ->
    delta -> state merge, cursor riding in the same commit. ``full=True``
    rebuilds from a scan (expired cursor, or to squash float drift):
    recomputed totals upsert every live group and groups absent from the
    recompute are deleted."""
    view = LakeTable(spark, view_path)
    cfg = _config_of(view)
    group, aggs = cfg["group"], cfg["aggs"]
    names = [N_COL] + [a["name"] for a in aggs]
    src = LakeTable(spark, cfg["source"])
    sid = src.current_snapshot_id()
    cursor = _find_cursor(view)
    if cursor is None:
        raise ValueError(f"{view.path} has no mv_cursor in its history")
    if sid == cursor:
        return {"view": view.path, "cursor": cursor, "changes": 0,
                "up_to_date": True}

    if not full:
        try:
            src.snapshot(cursor)
        except FileNotFoundError:
            raise ValueError(
                f"cursor snapshot {cursor} expired from the source — "
                "run with --full-refresh to rebuild"
            ) from None
        # change-sized when the source captures a change feed (lake/cdf.py);
        # falls back to the bucket-pruned snapshot diff per feed-less run
        env = changes_between(src, cursor, sid, coalesce=True)
        delta = delta_frame(env, group, aggs)
        events = _state_events(view, delta, group, names, seq=sid)
        r = merge_upsert(view, events, f"mv-refresh-{cursor}-{sid}",
                         summary_update={"mv_cursor": sid})
        return {"view": view.path, "from": cursor, "cursor": sid,
                "upserts": int(r.get("upserts", 0) or 0),
                "deletes": int(r.get("deletes", 0) or 0),
                "skipped": bool(r.get("skipped", False))}

    # full refresh: recomputed totals + deletes for groups that vanished
    agg_df = full_aggregate(src.read(snapshot_id=sid), group, aggs)
    types = {c["name"]: c["type"] for c in view.snapshot().current_schema()}
    fresh = agg_df.select(
        *[F.col(g) for g in group],
        *[F.col(n).cast(types[n]).alias(n) for n in names],
    )
    dead = view.read().join(fresh.select(*group), group, "left_anti")
    events = fresh.select(
        F.lit("U").alias("op"), F.lit(sid).alias("seq"), "*"
    ).unionByName(
        dead.select(F.lit("D").alias("op"), F.lit(sid).alias("seq"), "*")
    )
    r = merge_upsert(view, events, f"mv-full-{sid}",
                     summary_update={"mv_cursor": sid})
    return {"view": view.path, "cursor": sid, "full": True,
            "skipped": bool(r.get("skipped", False))}
