"""Sequence packing — map documents to fixed-length training sequences
(the concat-and-split packing used for LLM pretraining batches: concatenate
documents in a deterministic order, cut every ``seq_len`` tokens, and
record which sequences each document lands in).

Spark-first shape: packing is a running sum + integer division — pure
windowed arithmetic, no Python, no iteration. A GLOBAL running sum would
serialize into one task, so packing is done **per shard** (the unit a
training job reads independently — here the ``source`` column; in a real
pipeline, the input file/bucket). Each shard's window is its own partition,
the sums are map-side windowed, and sequence ids are (shard, local bin) —
exactly how distributed tokenizer/packer jobs shard in practice.

For each doc (ordered by ``order_col`` inside its shard):
    end    = running sum of token counts
    start  = end - n_tokens
    first/last sequence = start // seq_len, (end - 1) // seq_len
A document spanning a cut boundary appears in every sequence it overlaps
(one row per (doc, seq)) with its local [begin, end) token range inside
that sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    n_tokens_col: str,
    shard_col: str,
    order_col: str | list[str] = "doc_id",
    id_col: str = "doc_id",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(shard, seq_id, doc_id, begin, end): for every document, the packed
    sequences it occupies and its token span [begin, end) within each.
    Documents with zero/NULL token counts are dropped (nothing to pack).

    ``order_col`` may be a list when one column is not a total order (e.g.
    a mixture corpus where (doc_id, epoch) identifies a copy — a tied
    window order would make the running sum nondeterministic);
    ``passthrough`` appends extra input columns (e.g. ``epoch``) to the
    output index."""
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    w = (
        Window.partitionBy(shard_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n = F.col(n_tokens_col).cast("long")
    spans = (
        docs.where(n > 0)
        .withColumn("__end", F.sum(n).over(w))
        .withColumn("__start", F.col("__end") - n)
    )
    first = (F.col("__start") / seq_len).cast("long")
    last = ((F.col("__end") - 1) / seq_len).cast("long")
    exploded = spans.withColumn("seq_id", F.explode(F.sequence(first, last)))
    begin_in_seq = F.greatest(
        F.lit(0), F.col("__start") - F.col("seq_id") * seq_len
    )
    end_in_seq = F.least(
        F.lit(seq_len), F.col("__end") - F.col("seq_id") * seq_len
    )
    return exploded.select(
        F.col(shard_col).alias("shard"),
        "seq_id",
        F.col(id_col),
        *[F.col(c) for c in passthrough],
        begin_in_seq.cast("long").alias("begin"),
        end_in_seq.cast("long").alias("end"),
    )
