"""Custom stateful streaming operator — per-key sequence high-watermark
filtering with ``applyInPandasWithState``.

The merge already tolerates duplicates and out-of-order delivery (seq
guards / tombstones), but it pays for them: every stale or duplicate event
rides the full foreachBatch merge. At a 10^10-event stream with re-delivery
heavy sources (Kafka rebalances, producer retries), dropping them *in the
stream* — before the sink — cuts merge input by the duplicate factor.

This is the canonical `applyInPandasWithState` shape:

- stream groupBy(key columns) — state is per key, partitioned by the same
  hash the lake buckets on;
- state = the highest sequence number this key has ever emitted (one LONG
  per key — bounded, no timeout needed for CDC keys that live forever; a
  TTL can be layered with GroupStateTimeout for expiring keyspaces);
- each micro-batch, a key's events arrive as pandas DataFrames: emit only
  rows with seq > watermark (ties dropped: same seq = duplicate delivery),
  deduped and sorted within the batch, then advance the watermark.

Exactly-once composition: the filter only DROPS provably-redundant rows —
every surviving row still flows through the idempotent-commit merge sink,
so a micro-batch replay after a crash re-emits the same filtered rows (the
state store checkpoints with the query) and the sink skips them by
commit id, exactly as without the filter.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def watermark_filter(
    stream: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
) -> DataFrame:
    """Stateful per-key max-seq filter over a STREAMING DataFrame: passes
    only events strictly above the key's high watermark, in seq order,
    at most one per seq. Output schema == input schema."""
    schema = stream.schema
    out_ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)

    def advance(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (wm,) = state.get if state.exists else (-(1 << 62),)
        batches = [pdf for pdf in pdfs]
        ev = pd.concat(batches, ignore_index=True) if len(batches) > 1 else batches[0]
        ev = ev[ev[seq_col] > wm]
        if len(ev):
            ev = (
                ev.sort_values(seq_col)
                .drop_duplicates(subset=[seq_col], keep="first")
            )
            state.update((int(ev[seq_col].max()),))
            yield ev

    return (
        stream.groupBy(*key_cols)
        .applyInPandasWithState(
            advance,
            outputStructType=out_ddl,
            stateStructType="watermark long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
