"""Benchmark decontamination — flag training documents that share word
n-grams with an evaluation/benchmark corpus (the standard n-gram-collision
decontamination rule used for LLM training sets).

This is CROSS-corpus containment, not the self-join near-dup problem
(ops/dedup.py): the benchmark side is tiny relative to the corpus, so the
scale shape is

    corpus n-grams  ⋈broadcast  distinct benchmark n-grams

— one pass over the corpus (explode its n-grams), a broadcast hash join
against the benchmark's shingle set, and a per-doc count. No self-join, no
LSH needed: the benchmark set is the candidate filter. At 100 TB the
corpus-side explode is the data; the join adds no shuffle (broadcast) and
the per-doc aggregate is map-side combined.

Documents shorter than n tokens produce no n-grams (guarded — Spark's
`sequence(0, negative)` yields a DESCENDING range, so short docs must be
filtered before the window build).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from table2qb_spark.ops.text import word_ngrams_expr as _ngrams


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_hits): corpus documents sharing at least one word n-gram
    with the benchmark corpus, with the count of distinct shared n-grams.
    Benchmark documents present in ``docs`` (same id) are excluded — a
    benchmark doc trivially 'contaminates' itself."""
    bench_shingles = (
        benchmark.select(F.explode(_ngrams(F.col(text_col), n)).alias("shingle"))
        .distinct()
    )
    doc_shingles = docs.select(
        F.col(id_col), F.explode(_ngrams(F.col(text_col), n)).alias("shingle")
    )
    # distinct AFTER the broadcast join: distincting the raw corpus shingles
    # first would shuffle every exploded n-gram of the corpus; post-join only
    # benchmark-colliding postings shuffle (identical n_hits — the count is
    # over distinct shared (doc, shingle) either way)
    hits = (
        doc_shingles.join(F.broadcast(bench_shingles), "shingle")
        .distinct()
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    bench_ids = benchmark.select(F.col(id_col)).distinct()
    return hits.join(F.broadcast(bench_ids), id_col, "left_anti")
