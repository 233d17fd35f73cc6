"""Continuous outbound changelog tail (``cdc-subscribe``): a checkpointed
subscription that turns the lake into a CDC *producer* a downstream system
can follow — Debezium's connector lifecycle (initial snapshot -> streaming,
resumable offsets, "binlog purged" errors) re-expressed over lake snapshots.

``cdc-diff --envelope`` answers "what changed between A and B" once;
subscribe answers "keep feeding me everything that changes, exactly once,
across restarts". The pieces:

- **Cursor** — a tiny JSON file (``_cursor.json`` in the checkpoint dir)
  holding the last snapshot id whose changes were fully emitted. Written
  ATOMICALLY (tmp + rename) *after* the step's data lands, so a crash
  between data-write and cursor-write re-emits the same step into the same
  deterministic directory with ``mode=overwrite`` — idempotent, the
  downstream sees each step exactly once by directory name.
- **Bootstrap** — with no cursor and no ``--from-snapshot``, the first call
  emits the FULL current state as ``op='r'`` (read) envelope rows —
  Debezium's ``snapshot.mode=initial``. ``--from-snapshot REF`` instead
  starts streaming from a known snapshot (tag or id) with no bootstrap.
- **Steps** — one emission per committed snapshot in the ancestry between
  cursor and current (true changelog: intermediate states preserved), or
  one coalesced ``(cursor, current]`` diff with ``--coalesce`` (cheaper,
  collapses intermediate versions — Iceberg incremental scan shape). Each
  step directory ``step_<from>_<to>`` holds the Debezium envelope
  (``lake/diff.py::snapshot_diff_envelope``: op c/u/d, before/after images,
  flattened routing keys, snapshot ids + commit ts).
- **Expired cursor** — if the cursor's snapshot is no longer in the
  retained ancestry (``cdc-expire`` ran past it), raise with the oldest
  retained id instead of silently skipping changes: the MySQL "binlog
  purged, re-snapshot" contract. The caller re-bootstraps explicitly.
- **Follow mode** — poll loop (``--follow --poll-seconds S``) for a live
  tail; ``--max-polls`` bounds it for tests/cron. Single-writer per
  checkpoint dir is the caller's contract (same as Debezium connector
  names); concurrent subscribers use separate checkpoints.

Scale shape: each step is the bucket-pruned, co-partitioned diff join from
``lake/diff.py`` (buckets whose manifest pointers are identical in both
snapshots are never read), and the bootstrap is ONE full-table scan
projected to envelope shape — both stay fully distributed, the driver only
ever handles snapshot ids and footer-counted row totals. Parquet steps are
counted from footers (no second scan).

Reference analog: none (table2qb is batch-only ETL; SURVEY.md §1) —
north-rule outbound-CDC surface; Debezium envelope + Delta CDF
``readChangeFeed`` semantics re-expressed.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, functions as F

from table2qb_spark.lake.cdf import changes_between
from table2qb_spark.lake.table import LakeTable, _atomic_write

CURSOR_FILE = "_cursor.json"


def load_cursor(checkpoint_dir: str) -> "dict | None":
    p = os.path.join(checkpoint_dir, CURSOR_FILE)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def store_cursor(checkpoint_dir: str, last_snapshot: int) -> None:
    os.makedirs(checkpoint_dir, exist_ok=True)
    _atomic_write(
        os.path.join(checkpoint_dir, CURSOR_FILE),
        json.dumps({"last_snapshot": int(last_snapshot)}),
    )


class CursorExpiredError(RuntimeError):
    """The cursor's snapshot fell off the retained ancestry (cdc-expire ran
    past it) — the subscription can no longer prove it saw every change.
    Debezium's 'binlog position purged' contract: fail loudly, caller
    re-bootstraps (fresh checkpoint, or --from-snapshot a retained ref)."""


def pending_steps(
    table: LakeTable,
    last_snapshot: "int | None",
    coalesce: bool = False,
) -> list[tuple[int, int]]:
    """(from_id, to_id) diff steps not yet emitted, oldest first.

    ``last_snapshot=None`` means "no cursor" — the caller bootstraps
    instead. Rollback is handled for free: ``cdc-rollback`` commits a NEW
    snapshot whose state equals the older one, so it appears in the
    ancestry like any commit and its step emits the inverse changes
    (deletes for rolled-back inserts, etc.) — downstream converges."""
    hist = table.history()  # published ancestry, oldest first
    ids = [s.snapshot_id for s in hist]
    cur = ids[-1]
    if last_snapshot is None:
        raise ValueError("no cursor: bootstrap first (pending_steps needs "
                         "a last_snapshot)")
    if last_snapshot == cur:
        return []
    if last_snapshot not in ids:
        raise CursorExpiredError(
            f"cursor snapshot {last_snapshot} is not in the retained "
            f"ancestry (oldest retained: {ids[0]}, current: {cur}) — "
            "snapshots were expired past the subscription. Re-bootstrap "
            "with a fresh checkpoint or --from-snapshot a retained ref."
        )
    chain = ids[ids.index(last_snapshot):]
    if coalesce:
        return [(chain[0], chain[-1])]
    return list(zip(chain, chain[1:]))


def bootstrap_envelope(table: LakeTable) -> tuple[DataFrame, int]:
    """The full current state as ``op='r'`` envelope rows (Debezium initial
    snapshot): before=NULL, after=row image, from==to==current snapshot.
    One distributed scan, same schema as the incremental steps."""
    snap = table.snapshot()
    cols = [c["name"] for c in snap.current_schema()]
    keys = snap.key_columns
    df = table.read()
    row = F.struct(*[F.col(c).alias(c) for c in cols])
    env = df.select(
        F.lit("r").alias("op"),
        *[F.col(k).alias(k) for k in keys],
        F.lit(None).cast(f"struct<{', '.join(c['name'] + ':' + c['type'] for c in snap.current_schema())}>").alias("before"),
        row.alias("after"),
        F.lit(snap.snapshot_id).alias("from_snapshot"),
        F.lit(snap.snapshot_id).alias("to_snapshot"),
        F.lit(snap.timestamp_ms).alias("ts_ms"),
    )
    return env, snap.snapshot_id


def _emit(df: DataFrame, out_dir: str, fmt: str) -> "int | None":
    """Write one step/bootstrap directory; overwrite makes re-emission after
    a crash idempotent. Returns the row count (parquet: footer-only)."""
    if fmt == "jsonl":
        df.write.mode("overwrite").json(out_dir)
        return None
    df.write.mode("overwrite").parquet(out_dir)
    from table2qb_spark.ops.prep import _parquet_rows

    return _parquet_rows(out_dir)


def subscribe_once(
    table: LakeTable,
    out_dir: str,
    checkpoint_dir: str,
    from_snapshot: "int | None" = None,
    coalesce: bool = False,
    fmt: str = "parquet",
) -> dict:
    """One poll: bootstrap if no cursor, else emit every pending step; the
    cursor advances AFTER each step's data is durably written (crash
    between the two re-emits that one step idempotently)."""
    cursor = load_cursor(checkpoint_dir)
    emitted = []
    if cursor is None:
        if from_snapshot is not None:
            # start streaming from a known snapshot, no bootstrap emission
            store_cursor(checkpoint_dir, table.resolve_ref(from_snapshot))
        else:
            env, sid = bootstrap_envelope(table)
            step_dir = os.path.join(out_dir, f"bootstrap_{sid}")
            rows = _emit(env, step_dir, fmt)
            store_cursor(checkpoint_dir, sid)
            emitted.append({"step": f"bootstrap_{sid}", "op": "bootstrap",
                            "to_snapshot": sid, "rows": rows})
        cursor = load_cursor(checkpoint_dir)
    try:
        steps = pending_steps(table, cursor["last_snapshot"], coalesce)
    except CursorExpiredError:
        raise
    for frm, to in steps:
        # one-commit steps read the captured change feed when the table
        # has one (lake/cdf.py; coalesce keeps the per-key-net diff shape),
        # else the bucket-pruned snapshot diff
        env = changes_between(table, frm, to, coalesce=True)
        step_dir = os.path.join(out_dir, f"step_{frm}_{to}")
        rows = _emit(env, step_dir, fmt)
        store_cursor(checkpoint_dir, to)
        emitted.append({"step": f"step_{frm}_{to}", "op": "diff",
                        "from_snapshot": frm, "to_snapshot": to,
                        "rows": rows})
    return {
        "emitted": emitted,
        "steps": len(emitted),
        "cursor": load_cursor(checkpoint_dir)["last_snapshot"],
    }


def subscribe_follow(
    table: LakeTable,
    out_dir: str,
    checkpoint_dir: str,
    poll_seconds: float = 10.0,
    max_polls: "int | None" = None,
    from_snapshot: "int | None" = None,
    coalesce: bool = False,
    fmt: str = "parquet",
) -> dict:
    """Live tail: poll until ``max_polls`` (None = forever). Each poll is a
    full ``subscribe_once`` — the sleep only happens when a poll emitted
    nothing (busy stream never waits)."""
    polls = 0
    total = []
    while True:
        r = subscribe_once(table, out_dir, checkpoint_dir,
                           from_snapshot=from_snapshot, coalesce=coalesce,
                           fmt=fmt)
        total.extend(r["emitted"])
        polls += 1
        if max_polls is not None and polls >= max_polls:
            break
        if not r["emitted"]:
            time.sleep(poll_seconds)
    return {"emitted": total, "steps": len(total), "polls": polls,
            "cursor": load_cursor(checkpoint_dir)["last_snapshot"]}
