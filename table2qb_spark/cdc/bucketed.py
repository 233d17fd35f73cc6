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

Trade-offs vs the shuffle merge (lake/merge.py):
- requires the log laid out by the same bucket function (producer-side
  repartition — paid once, at ingest, amortized over every replay);
- per-bucket data must fit one task's memory (bucket count is the knob);
- the union-of-subplans plan grows with bucket count (fine to ~1k buckets;
  beyond that a custom DataSource would assign file groups to partitions).
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


def write_bucketed_change_log(
    df: DataFrame, path: str, key_cols: list[str], n_buckets: int
) -> None:
    """Producer-side layout: one directory per key bucket (the Kafka-keyed-
    topic equivalent). One shuffle here buys shuffle-free replay forever."""
    out = df.withColumn("b", key_bucket_expr(key_cols, n_buckets))
    out.repartition(n_buckets, F.col("b")).write.mode("overwrite").partitionBy(
        "b"
    ).parquet(path)


class BucketedReplayer:
    """Seq-range replay over a bucket-partitioned change log. Same commit
    manifests / checkpoints / metrics as ChangeLogReplayer — only the
    physical merge differs (no shuffle).

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
        self._events_schema = self.spark.read.parquet(
            os.path.join(events_dir, f"b={self._event_buckets[0]}")
        ).schema

    # ----- merge of one seq range ------------------------------------------

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

        children = []
        for b in self._event_buckets:
            ev = (
                self.spark.read.schema(self._events_schema)
                .parquet(os.path.join(self.events_dir, f"b={b}"))
                .where((F.col(self.seq_col) >= lo) & (F.col(self.seq_col) <= hi))
                .select(
                    *keys,
                    F.col(self.seq_col).cast("long").alias("__seq"),
                    F.col(self.op_col).alias("__op"),
                    *[F.col(c) for c in value_cols],
                )
            )
            cur_entries = snap.files.get(str(b), [])
            if cur_entries:
                cur = self.table.read(buckets=[b]).select(
                    *keys,
                    F.lit(-1).cast("long").alias("__seq"),
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
            # last-writer-wins: stable sort by __seq, keep the last per key
            pdf = pdf.sort_values("__seq", kind="stable")
            pdf = pdf.drop_duplicates(subset=key_list, keep="last")
            pdf = pdf[pdf[op_col_name] != delete_op]
            yield pdf[key_list + val_list + ["__bucket"]]

        merged = unioned.mapInPandas(winner_per_partition, schema=out_ddl)

        new_files = self.table.write_data_files(
            merged, snapshot_hint=f"{snap.snapshot_id + 1:08d}", repartition=False
        )
        affected = sorted(set(self._event_buckets) | {int(x) for x in snap.files})
        for b in affected:
            new_files.setdefault(b, [])
        su = {"max_seq": hi, "mode": "bucketed"}
        su.update(summary_update or {})
        self.table.commit_files(commit_id, affected, new_files, su)
        return {
            "skipped": False,
            "commit_id": commit_id,
            "affected_buckets": len(affected),
            "seconds": time.time() - t0,
        }

    # ----- full replay --------------------------------------------------------

    def seq_bounds(self) -> tuple[int, int]:
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
                "seconds": round(elapsed, 3),
                "events_per_sec": round((end - start + 1) / elapsed, 1) if elapsed else None,
                "lag_events": max(0, hi - end),
                "mode": "bucketed",
            }
            with open(self.metrics_path, "a", encoding="utf-8") as f:
                f.write(json.dumps(metrics) + "\n")
            out.append(stats)
        return out
