"""Shuffle-free bucketed CDC apply — the scale path.

Production change logs are partitioned by key at the producer (Kafka topic
partitions keyed on (repo, path); Debezium does the same). When the log's
partitioning function equals the lake table's bucket function, the MERGE
needs **no wide shuffle at all**:

    for each bucket b:   winner(key) = last-writer-wins over
                         events[b=b, seq range] ∪ current rows[bucket b]

Each bucket's events and current files are read into ONE task partition
(union of per-bucket coalesced subplans), the last-writer-wins reduction
runs locally per partition (vectorized Arrow ``mapInPandas`` — pandas
sort + drop_duplicates over one bucket's rows), and each task writes its own
bucket directory. Memory traffic per batch = read events + read touched
buckets + write touched buckets — no shuffle spill/serialization at all.
This is what makes 4N-executor scaling near-linear: there is no all-to-all
exchange left to contend on.

**Bucket pruning** (the steady-state-small-batch property that matters at
100 TB): the replayer indexes each event file's (min_seq, max_seq) from its
parquet footer once at startup — a metadata read, no data scan. A seq range
then touches only the buckets whose footers overlap it; every other bucket's
current files are carried forward in the commit untouched (copy-on-write
rewrites ONLY overlapping buckets, not all n_buckets). A bucket present in
the table but absent from the event layout is likewise carried forward, never
replaced — replaying a log segment that lacks some bucket dirs cannot drop
rows.

Trade-offs vs the shuffle merge (lake/merge.py):
- requires the log laid out by the same bucket function AND the same bucket
  count as the table (validated at startup against the log's _layout.json);
- per-bucket data must fit one task's memory (bucket count is the knob);
- the union-of-subplans plan grows with touched-bucket count (fine to ~1k
  buckets; beyond that a custom DataSource would assign file groups to
  partitions).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Iterator
from functools import reduce

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from table2qb_spark.lake.table import LakeTable, key_bucket_expr

LAYOUT_FILE = "_layout.json"


def write_bucketed_change_log(
    df: DataFrame, path: str, key_cols: list[str], n_buckets: int
) -> None:
    """Producer-side layout: one directory per key bucket (the Kafka-keyed-
    topic equivalent). One shuffle here buys shuffle-free replay forever.
    A _layout.json records the bucket function parameters so replayers can
    refuse a log whose layout doesn't match the table."""
    out = df.withColumn("b", key_bucket_expr(key_cols, n_buckets))
    out.repartition(n_buckets, F.col("b")).write.mode("overwrite").partitionBy(
        "b"
    ).parquet(path)
    with open(os.path.join(path, LAYOUT_FILE), "w", encoding="utf-8") as f:
        json.dump({"key_columns": key_cols, "n_buckets": n_buckets}, f)


def _bucket_seq_index(
    events_dir: str, buckets: list[int], seq_col: str
) -> dict[int, tuple[int, int]]:
    """{bucket: (min_seq, max_seq)} from parquet footer statistics — a
    driver-side metadata read (no data scan, no Spark job). At cluster scale
    this index would live in the log's manifest; the shape is identical."""
    import pyarrow.parquet as pq

    index: dict[int, tuple[int, int]] = {}
    for b in buckets:
        b_dir = os.path.join(events_dir, f"b={b}")
        lo = hi = None
        for fn in os.listdir(b_dir):
            if not fn.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(b_dir, fn)).metadata
            try:
                ci = md.schema.to_arrow_schema().get_field_index(seq_col)
            except KeyError:
                ci = -1
            if ci < 0:
                continue
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    # no stats -> must assume the file spans everything
                    return {bb: (-(2**62), 2**62) for bb in buckets}
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            index[b] = (int(lo), int(hi))
    return index


class BucketedReplayer:
    """Seq-range replay over a bucket-partitioned change log. Same commit
    manifests / checkpoints / metrics as ChangeLogReplayer — only the
    physical merge differs (no shuffle, footer-pruned copy-on-write).

    v1 limitation: payload_json schema evolution is not parsed on this path
    (use ChangeLogReplayer for evolving segments, or evolve the schema ahead
    of the range); everything else — dedup, I/U/D, exactly-once, resume —
    is identical and verified against the same oracle."""

    def __init__(
        self,
        spark: SparkSession,
        table: LakeTable,
        events_dir: str,
        seq_col: str = "seq",
        op_col: str = "op",
        delete_op: str = "D",
        batch_events: int = 1_000_000,
    ):
        self.spark = spark
        self.table = table
        self.events_dir = events_dir
        self.seq_col = seq_col
        self.op_col = op_col
        self.delete_op = delete_op
        self.batch_events = batch_events
        self.metrics_path = os.path.join(table.path, "_meta", "metrics.jsonl")
        self._event_buckets = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(events_dir)
            if d.startswith("b=")
        )
        n_buckets = table.snapshot().n_buckets
        layout_path = os.path.join(events_dir, LAYOUT_FILE)
        if os.path.exists(layout_path):
            with open(layout_path) as f:
                layout = json.load(f)
            if int(layout["n_buckets"]) != n_buckets:
                raise ValueError(
                    f"Change-log layout has n_buckets={layout['n_buckets']} but the "
                    f"table has n_buckets={n_buckets}; bucket-aligned replay would "
                    "misplace rows — use ChangeLogReplayer or rewrite the log"
                )
        elif self._event_buckets and self._event_buckets[-1] >= n_buckets:
            raise ValueError(
                f"Change-log bucket ids reach {self._event_buckets[-1]} but the table "
                f"has only n_buckets={n_buckets}; layouts do not match"
            )
        self._events_schema = self.spark.read.parquet(
            os.path.join(events_dir, f"b={self._event_buckets[0]}")
        ).schema
        self._seq_index = _bucket_seq_index(events_dir, self._event_buckets, seq_col)

    # ----- merge of one seq range ------------------------------------------

    def buckets_in_range(self, lo: int, hi: int) -> list[int]:
        """Event buckets whose footer (min,max) seq overlaps [lo, hi]."""
        return [
            b
            for b in self._event_buckets
            if b in self._seq_index
            and self._seq_index[b][0] <= hi
            and self._seq_index[b][1] >= lo
        ]

    def apply_range(
        self, commit_id: str, lo: int, hi: int, summary_update: dict | None = None
    ) -> dict:
        if self.table.has_commit(commit_id):
            return {"skipped": True, "commit_id": commit_id}
        t0 = time.time()
        snap = self.table.snapshot()
        keys = snap.key_columns
        data_cols = [c["name"] for c in snap.current_schema()]
        value_cols = [c for c in data_cols if c not in keys]
        out_ddl = ", ".join(
            [f"`{c['name']}` {c['type']}" for c in snap.current_schema()]
        ) + ", __bucket int"

        # footer-pruned copy-on-write: only buckets whose event files overlap
        # the seq range are merged + replaced; everything else carries forward
        relevant = self.buckets_in_range(lo, hi)
        su = {"max_seq": hi, "mode": "bucketed"}
        su.update(summary_update or {})
        if not relevant:
            self.table.commit_files(
                commit_id, [], {}, su, base_snapshot_id=snap.snapshot_id
            )
            return {
                "skipped": False,
                "commit_id": commit_id,
                "affected_buckets": 0,
                "seconds": time.time() - t0,
            }

        children = []
        for b in relevant:
            ev = (
                self.spark.read.schema(self._events_schema)
                .parquet(os.path.join(self.events_dir, f"b={b}"))
                .where((F.col(self.seq_col) >= lo) & (F.col(self.seq_col) <= hi))
                .select(
                    *keys,
                    F.col(self.seq_col).cast("long").alias("__seq"),
                    F.lit(1).alias("__pri"),  # seq tie: event beats stored row
                    F.col(self.op_col).alias("__op"),
                    *[F.col(c) for c in value_cols],
                )
            )
            cur_entries = snap.files.get(str(b), [])
            if cur_entries:
                cur = self.table.read(buckets=[b]).select(
                    *keys,
                    F.lit(-1).cast("long").alias("__seq"),
                    F.lit(0).alias("__pri"),
                    F.lit("U").alias("__op"),
                    *[F.col(c) for c in value_cols],
                )
                child = ev.unionByName(cur)
            else:
                child = ev
            children.append(child.coalesce(1).withColumn("__bucket", F.lit(b)))

        unioned = reduce(lambda a, b: a.unionByName(b), children)

        key_list, op_col_name, delete_op = list(keys), "__op", self.delete_op
        val_list = list(value_cols)

        def winner_per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            chunks = list(batches)
            if not chunks:
                return
            pdf = pd.concat(chunks, ignore_index=True)
            if len(pdf) == 0:
                return
            # last-writer-wins: stable sort by (__seq, __pri), keep the last
            # per key — an event whose seq ties the stored row's wins
            pdf = pdf.sort_values(["__seq", "__pri"], kind="stable")
            pdf = pdf.drop_duplicates(subset=key_list, keep="last")
            pdf = pdf[pdf[op_col_name] != delete_op]
            yield pdf[key_list + val_list + ["__bucket"]]

        merged = unioned.mapInPandas(winner_per_partition, schema=out_ddl)

        new_files = self.table.write_data_files(
            merged, snapshot_hint=f"{snap.snapshot_id + 1:08d}", repartition=False
        )
        for b in relevant:
            new_files.setdefault(b, [])  # bucket lost all rows: old files go
        self.table.commit_files(
            commit_id, relevant, new_files, su, base_snapshot_id=snap.snapshot_id
        )
        return {
            "skipped": False,
            "commit_id": commit_id,
            "affected_buckets": len(relevant),
            "seconds": time.time() - t0,
        }

    # ----- full replay --------------------------------------------------------

    def seq_bounds(self) -> tuple[int, int]:
        los, his = zip(*self._seq_index.values())
        if min(los) > -(2**62):  # footer stats present: no Spark job needed
            return min(los), max(his)
        r = (
            self.spark.read.schema(self._events_schema)
            .parquet(*[os.path.join(self.events_dir, f"b={b}") for b in self._event_buckets])
            .agg(F.min(self.seq_col).alias("lo"), F.max(self.seq_col).alias("hi"))
            .collect()[0]
        )
        return int(r["lo"]), int(r["hi"])

    def last_applied_batch(self) -> int:
        return int(self.table.snapshot().summary.get("last_batch", -1))

    def run(self, max_batches: int | None = None) -> list[dict]:
        lo, hi = self.seq_bounds()
        n_batches = (hi - lo) // self.batch_events + 1
        first = self.last_applied_batch() + 1
        out = []
        for i in range(first, n_batches):
            if max_batches is not None and len(out) >= max_batches:
                break
            start = lo + i * self.batch_events
            end = start + self.batch_events - 1
            t0 = time.time()
            stats = self.apply_range(
                f"cdc-{i:08d}", start, end, summary_update={"last_batch": i}
            )
            elapsed = time.time() - t0
            metrics = {
                "batch": i,
                "commit_id": f"cdc-{i:08d}",
                "seq_start": start,
                "seq_end": end,
                "buckets_touched": stats.get("affected_buckets", 0),
                "seconds": round(elapsed, 3),
                "events_per_sec": round((end - start + 1) / elapsed, 1) if elapsed else None,
                "lag_events": max(0, hi - end),
                "mode": "bucketed",
            }
            with open(self.metrics_path, "a", encoding="utf-8") as f:
                f.write(json.dumps(metrics) + "\n")
            out.append(stats)
        return out
