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


def embedding_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    centroids: DataFrame | None = None,
    n_centroids: int | None = None,
) -> DataFrame:
    """Embedding-space decontamination — the semantic companion to
    ``ngram_contamination``: flag corpus documents whose EMBEDDING is
    within cosine ``threshold`` of any benchmark embedding. N-gram
    collision misses paraphrased benchmark leakage; this catches it the
    same way SemDeDup catches paraphrased duplicates.

    Output: ``(id, n_hits, max_cosine)`` — one row per contaminated corpus
    vector (count of benchmark neighbors over the threshold and the
    strongest match). Benchmark vectors sharing an id with corpus rows are
    NOT excluded here (ids live in different tables); exclude upstream if
    the corpora overlap.

    Scale shape: both sides are assigned to the SAME IVF coarse quantizer
    (one broadcast-centroid scan each), then matched with an equi-join on
    centroid_id — the quadratic compare is confined to (cell corpus) x
    (cell benchmark), and since the benchmark side is tiny, AQE broadcasts
    its assigned cells; the per-id aggregate is map-side combined. Like
    every IVF path this is approximate: a pair straddling two cells is
    missed — raise centroid overlap (multi-probe) or fall back to
    ``ops.ann.cosine_topk``'s broadcast form when the benchmark is small
    enough to skip IVF entirely."""
    from table2qb_spark.ops import ann

    if centroids is None:
        if n_centroids is None:
            n_centroids = ann.n_centroids_for(corpus.count())
        centroids = ann.kmeans_centroids(corpus, n_centroids, id_col, vec_col)
    c = ann.ivf_assign(corpus, centroids, id_col, vec_col).select(
        "centroid_id", F.col(id_col), F.col(vec_col).alias("cv")
    )
    b = ann.ivf_assign(benchmark, centroids, id_col, vec_col).select(
        "centroid_id", F.col(vec_col).alias("bv")
    )
    cos = F.round(ann.cosine_expr(F.col("cv"), F.col("bv")), round_to)
    return (
        c.join(b, "centroid_id")
        .select(F.col(id_col), cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.max("cosine").alias("max_cosine"),
        )
    )
