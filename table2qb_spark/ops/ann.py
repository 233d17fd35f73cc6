"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force top-k — the exact baseline. Query set is tiny
  and **broadcast**; each executor scans its slice of the corpus once, and
  top-k is a per-query window over (query × corpus-partition) partial
  results. Cost: one corpus scan per batch of queries, no corpus shuffle.
- ``ivf_topk``: the scale path — corpus pre-assigned to the nearest of C
  centroids (here: deterministic seed vectors taken from the corpus itself;
  swap in k-means output on a real run); queries probe only their nearest
  ``n_probe`` centroid partitions. Turns the scan into a partition-pruned
  read when the assignment is materialized as a bucketed table.
- ``cosine_neardup_pairs``: embedding near-dup for dedup pipelines.

Dot products run as ``F.zip_with`` + ``F.aggregate`` over DOUBLE — pure
Catalyst (no Python), deterministic sequential summation, matching the SQL
oracle bit-for-bit at 4-decimal rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact top-k neighbors per query (self excluded).
    corpus/queries: (id_col, vec_col). Queries are broadcast."""
    from pyspark.sql.window import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("qv"), F.col("cv")), round_to).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid (broadcast join +
    per-vector argmax — one corpus scan). centroids: (centroid_id, cv)."""
    from pyspark.sql.window import Window

    scored = corpus.join(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("centroid_id"),
        cosine_expr(F.col(vec_col), F.col("cv")).alias("sim"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("sim").desc(), F.col("centroid_id").asc())
    return (
        scored.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select(id_col, vec_col, "centroid_id")
    )


def seed_centroids(
    corpus: DataFrame, n: int = 4, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic centroids: the n lowest-id corpus vectors (stand-in for
    a k-means pass; keeps the whole operator SQL-oracle-able)."""
    return (
        corpus.orderBy(id_col)
        .limit(n)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cv"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """IVF (single-probe): score only corpus vectors sharing the query's
    nearest centroid. Approximate — recall depends on centroid quality."""
    from pyspark.sql.window import Window

    assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    q_assigned = ivf_assign(queries, centroids, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.col("centroid_id"),
    )
    scored = (
        assigned.withColumnRenamed(id_col, "neighbor_id")
        .withColumnRenamed(vec_col, "cv")
        .join(F.broadcast(q_assigned), on="centroid_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("qv"), F.col("cv")), round_to).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_neardup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
    centroids: DataFrame | None = None,
    n_centroids: int = 8,
    exact: bool = False,
) -> DataFrame:
    """Embedding near-dup pairs (a < b) with cosine >= threshold.

    Scale path (default): IVF-partitioned pairing — every vector is assigned
    to its nearest centroid (one broadcast-join corpus scan), then pairs are
    generated ONLY within a centroid partition via an **equi-join on
    centroid_id** (hash/sort-merge, never a nested-loop cross join). The
    quadratic blowup is confined to one partition's population, and at high
    thresholds near-dups share their nearest centroid with overwhelming
    probability (the standard IVF coarse-quantizer argument; raise
    ``n_centroids`` with corpus size to keep partitions bounded, or pass
    k-means ``centroids``). Approximate: a pair straddling two centroid
    cells is missed — the recall/cost knob every ANN index exposes.

    ``exact=True`` keeps the brute-force all-pairs form for small corpora or
    recall evaluation (cartesian — do not run at scale)."""
    if exact:
        a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        if centroids is None:
            centroids = seed_centroids(corpus, n_centroids, id_col, vec_col)
        assigned = ivf_assign(corpus, centroids, id_col, vec_col)
        a = assigned.select(
            F.col("centroid_id"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
        )
        b = assigned.select(
            F.col("centroid_id"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
        )
        pairs = a.join(b, on="centroid_id").where(F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(cosine_expr(F.col("va"), F.col("vb")), round_to).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
