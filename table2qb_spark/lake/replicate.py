"""Lake-to-lake replication (``cdc-replicate``): keep a TARGET lake table
converged to a SOURCE lake table by applying snapshot envelopes — the
"another lake" consumer the outbound-CDC story promises, closed with this
engine's own parts (Iceberg-to-Iceberg mirror / Delta DEEP CLONE's
incremental sync, re-expressed).

Why not just copy files? A mirror may need a DIFFERENT physical layout —
bucket count sized to its cluster, its own compaction cadence, its own
retention — while staying row-identical. Replication moves CHANGES, so
each sync costs O(changed rows), not O(table).

Composition (everything here is already individually tested):

- delta = ``changes_between(source, cursor, current)`` — one coalesced
  envelope, read from the source's change feed when captured
  (lake/cdf.py) else derived by the bucket-pruned diff; net before/after
  is exactly what a final-state mirror needs (intermediate versions
  carry no information for it);
- apply = ``merge_upsert(target, events)`` with op D for 'd' rows (and for
  tombstone sources' delete row-images) and U otherwise, seq = the source
  snapshot id (monotone across syncs, so a seq-guarded target also
  behaves). The mirror is a LIVE-STATE replica: the source's bookkeeping
  columns (_seq, _deleted) never replicate — tombstoned keys are simply
  absent on the mirror;
- cursor = ``repl_cursor`` in the target's own commit summary — state and
  cursor move in ONE commit (the lake/materialize.py pattern), and the
  commit id ``repl-<from>-<to>`` makes a crashed/re-run sync a marker
  skip. No side checkpoint files; the subscription state IS the target.
- bootstrap = full source read applied as one upsert batch
  (``repl-bootstrap-<sid>``);
- schema evolution = before applying, any column the source's CURRENT
  schema has and the target lacks is ADDed (metadata-only commit via
  ``evolve_schema``); renames arrive as add+null-backfill (a mirror
  cannot distinguish a rename from drop+add in final-state terms —
  documented divergence from the source's column-id lineage);
- expired cursor = loud error; ``full_resync=True`` re-reads the source
  and also deletes target keys the source no longer has (anti-join).

Scale shape: bootstrap is one distributed scan; each sync is the
bucket-pruned co-partitioned diff join + a merge whose strategy the lake
already picks by measured batch size. If source and target share a bucket
count the merge keys arrive pre-clustered; they don't have to.

Reference analog: none (SURVEY.md §1) — north-rule surface.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from table2qb_spark.lake.cdf import changes_between
from table2qb_spark.lake.merge import merge_upsert
from table2qb_spark.lake.table import LakeTable

CURSOR_KEY = "repl_cursor"


def _find_cursor(target: LakeTable) -> "int | None":
    for snap in reversed(target.history()):
        cur = snap.summary.get(CURSOR_KEY)
        if cur is not None:
            return int(cur)
    return None


def _sync_schema(src: LakeTable, dst: LakeTable) -> list[str]:
    """ADD any column the source's current schema has and the target
    lacks (lossless type as declared by the source). Returns added names.
    The source's bookkeeping columns (_seq/_deleted) never replicate —
    the mirror is a LIVE-STATE replica (see ``replicate``)."""
    src_cols = {c["name"]: c["type"] for c in src.snapshot().current_schema()
                if c["name"] not in ("_seq", "_deleted")}
    dst_names = {c["name"] for c in dst.snapshot().current_schema()}
    add = [(n, t) for n, t in src_cols.items() if n not in dst_names]
    if add:
        dst.evolve_schema(add_columns=add)
    return [n for n, _ in add]


def replicate(
    spark: SparkSession,
    source_path: str,
    target_path: str,
    n_buckets: "int | None" = None,
    full_resync: bool = False,
) -> dict:
    """One sync pass: create+bootstrap the target if absent, else apply the
    coalesced envelope since the target's ``repl_cursor``. Idempotent and
    exactly-once by the target's own commit markers."""
    src = LakeTable(spark, source_path)
    sid = src.current_snapshot_id()
    s_snap = src.snapshot(sid)

    if not LakeTable.exists(target_path):
        # LIVE-STATE replica: the source's bookkeeping columns (_seq,
        # _deleted) stay home — a mirror has its own sync cursor for
        # ordering, and physically materializing the source's tombstones
        # would need their semantics re-implemented here (the previous
        # schema-verbatim copy silently RESURRECTED tombstoned keys: the
        # merge excludes _deleted from the payload, so every replicated
        # row landed _deleted=false)
        dst = LakeTable.create(
            spark, target_path,
            [(c["name"], c["type"]) for c in s_snap.current_schema()
             if c["name"] not in ("_seq", "_deleted")],
            key_columns=s_snap.key_columns,
            n_buckets=n_buckets or s_snap.n_buckets,
            properties=dict(s_snap.properties),
        )
        events = src.read_live(snapshot_id=sid).select(
            F.lit("U").alias("op"), F.lit(sid).alias("seq"), "*"
        )
        r = merge_upsert(dst, events, f"repl-bootstrap-{sid}",
                         summary_update={CURSOR_KEY: sid})
        return {"target": dst.path, "source": src.path, "cursor": sid,
                "bootstrap": True, "upserts": int(r.get("upserts", 0) or 0)}

    dst = LakeTable(spark, target_path)
    if dst.snapshot().key_columns != s_snap.key_columns:
        raise ValueError(
            f"target key columns {dst.snapshot().key_columns} != source "
            f"{s_snap.key_columns} — not a replica of this source"
        )
    cursor = _find_cursor(dst)
    if cursor is None:
        raise ValueError(
            f"{dst.path} has no {CURSOR_KEY} in its history — it was not "
            "created by cdc-replicate (bootstrap into a fresh directory)"
        )
    if cursor == sid and not full_resync:
        return {"target": dst.path, "cursor": sid, "up_to_date": True}

    added = _sync_schema(src, dst)
    src_value = {c["name"] for c in s_snap.current_schema()
                 if c["name"] not in s_snap.key_columns
                 and c["name"] not in ("_seq", "_deleted")}
    src_tombstones = any(
        c["name"] == "_deleted" for c in s_snap.current_schema()
    )
    # the TARGET's value columns drive the batch shape: a column the source
    # DROPPED stays on the mirror (drop is not replicated — retention is
    # the mirror's own policy) and fills NULL on newly-changed rows
    dst_value = [(c["name"], c["type"])
                 for c in dst.snapshot().current_schema()
                 if c["name"] not in s_snap.key_columns
                 and c["name"] not in ("_seq", "_deleted")]

    if full_resync:
        fresh = src.read_live(snapshot_id=sid)
        dead = dst.read().join(
            fresh.select(*s_snap.key_columns), s_snap.key_columns,
            "left_anti",
        )
        events = fresh.select(
            F.lit("U").alias("op"), F.lit(sid).alias("seq"), "*"
        ).unionByName(
            dead.select(F.lit("D").alias("op"), F.lit(sid).alias("seq"),
                        "*"),
            allowMissingColumns=True,
        )
        r = merge_upsert(dst, events, f"repl-full-{sid}",
                         summary_update={CURSOR_KEY: sid})
        return {"target": dst.path, "cursor": sid, "full_resync": True,
                "schema_added": added,
                "skipped": bool(r.get("skipped", False))}

    try:
        src.snapshot(cursor)
    except FileNotFoundError:
        raise ValueError(
            f"cursor snapshot {cursor} expired from the source — run with "
            "--full-resync"
        ) from None
    # change-sized when the source captures a change feed (lake/cdf.py);
    # falls back to the bucket-pruned snapshot diff per feed-less run
    env = changes_between(src, cursor, sid, coalesce=True)
    # tombstone sources deliver deletes as 'u' rows whose after-image has
    # _deleted=true (the feed mirrors the physical row model — lake/cdf.py);
    # the live-state mirror maps those to D like any other delete
    is_delete = F.col("op") == "d"
    if src_tombstones:
        is_delete = is_delete | F.coalesce(
            F.col("after._deleted"), F.lit(False)
        )
    events = env.select(
        F.when(is_delete, "D").otherwise("U").alias("op"),
        F.lit(sid).alias("seq"),
        *s_snap.key_columns,
        *[
            F.col(f"after.{c}").alias(c) if c in src_value
            else F.lit(None).cast(t).alias(c)
            for c, t in dst_value
        ],
    )
    r = merge_upsert(dst, events, f"repl-{cursor}-{sid}",
                     summary_update={CURSOR_KEY: sid})
    return {"target": dst.path, "from": cursor, "cursor": sid,
            "upserts": int(r.get("upserts", 0) or 0),
            "deletes": int(r.get("deletes", 0) or 0),
            "schema_added": added,
            "skipped": bool(r.get("skipped", False))}
