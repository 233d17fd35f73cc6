"""BM25 text retrieval over a document corpus — the training-data search
primitive (find documents about X; dedup against a benchmark; targeted
decontamination sweeps).

Spark-first shape (no index structure needed — the aggregation IS the
inverted index, built on the fly for exactly the query's terms):

1. tokenize: one `explode(split(lower(text)))` projection;
2. doc lengths: map-side-combined count per doc (one narrow shuffle);
3. **prune to the query's terms BEFORE any per-term aggregation** — the
   term-frequency groupBy only ever sees rows whose term is in the query
   (a literal `isin` filter that pushes into the scan-side projection), so
   its shuffle is O(matching postings), not O(corpus tokens);
4. document frequencies + corpus stats are a handful of rows — broadcast;
5. score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)), the
   standard BM25 form (Robertson/Spärck Jones); top-k by (score, doc_id)
   for a deterministic result.

At 100 TB the only corpus-sized costs are the tokenize scan and the
per-doc length aggregate — both embarrassingly parallel; everything
per-term is query-sized. Repeated querying would precompute (doc length,
postings) once; the plan here is the one-shot form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from table2qb_spark.ops.text import ALNUM_TOKEN_SPLIT as TOKEN_SPLIT


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k (doc, score) for a bag-of-words query. Deterministic: ties
    break on doc id; score rounded to 4 decimals for cross-engine
    comparability."""
    terms = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT)).alias("term"),
    ).where(F.col("term") != "")

    dl = terms.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    q = terms.where(F.col("term").isin([t.lower() for t in query_terms]))
    tf = q.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "part",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum("part"), 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def tfidf_keywords(
    docs: DataFrame,
    m: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``m`` TF-IDF keywords per document — corpus summarization /
    labeling / near-dup triage primitive (what is this doc about, without
    a model). Smoothed idf: score = tf · (ln((N+1)/(df+1)) + 1), rounded
    to 4 (the ROUNDED score orders the ranking so ties resolve identically
    on every engine; term ascending breaks exact ties).

    Scale shape: tf = one map-side-combined (doc, term) count; df derives
    from the tf table (second map-side agg — never a countDistinct over
    raw tokens); N is a one-row aggregate crossJoined back (broadcast).
    The final top-m window partitions by DOCUMENT — partition size is a
    doc's distinct-term count, bounded by document length, never by the
    corpus (unlike a per-term or global window).

    Output: (doc_id, term, score, rank), rank 1..m per doc.
    """
    if m <= 0:
        raise ValueError("m must be > 0")
    from pyspark.sql.window import Window

    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT), lambda t: t != "")
        ).alias("term"),
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("__n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            id_col,
            "term",
            F.round(
                F.col("tf")
                * (F.log((F.col("__n") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                4,
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= m)
    )
