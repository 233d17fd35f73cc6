"""Driver-contract query catalog: every implemented operator from
SURVEY.md §2 (+ the training-data ops) as a (spark_fn, oracle_sql) pair.

Each spark_fn(spark, sf_dir) returns a DataFrame; each oracle is ANSI SQL
DuckDB runs over the same parquet tables (views: region nation customer
supplier part orders lineitem events documents embeddings). Column names and
value canonicalization (rounded doubles, epoch-ms bigints, no raw
timestamps) are aligned on both sides so the driver's order-insensitive
value-hash comparison matches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from table2qb_spark.config.columns import ColumnsConfig, ColumnDescriptor
from table2qb_spark.config.cube import get_cube_configuration
from table2qb_spark.functions import transforms as T
from table2qb_spark.ops import ann, dedup, multimodal, text
from table2qb_spark.pipelines import codelist as codelist_pipe
from table2qb_spark.pipelines import components as components_pipe
from table2qb_spark.pipelines import cube as cube_pipe


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a fixture table, repartitioning when the scan would underfill
    the cluster (guide §2.5 "input skew": one huge unsplittable file).

    The SF fixtures are single-row-group parquet files, and a parquet file
    parallelizes at row-group granularity — so every documents/embeddings/
    events scan, plus ALL the per-row compute Catalyst fuses into the scan
    stage (simhash folds, cosine assignment, text metrics), otherwise runs
    as ONE task regardless of core count (measured: text_analysis 5.9 s on
    one core at sf1.0, ~0.5 s repartitioned). The gate is scale-adaptive:
    it fires only when the planned scan has fewer splits than the default
    parallelism, so a production table with thousands of row groups is
    untouched and nothing heavy is ever shuffled. Two more gates keep the
    exchange from costing more than it buys (A/B-measured at sf1.0):

    - file size < 64 MB: past that, the full-table shuffle itself becomes
      the cost the parallelism win has to beat;
    - compressed bytes/row >= 64 (footer-only metadata, no scan): fat rows
      are documents/embeddings — few rows, heavy per-row compute (regex
      metrics, 60-bit votes, cosine folds), where the repartition is worth
      3-30x (ann_cosine_topk 2.0 s -> 0.7 s). Thin rows are relational
      fact tables (events 16 B/row, lineitem 22 B/row) whose map-side-
      combined aggregations are as cheap as the shuffle they'd pay:
      repartitioning DOUBLED cdc_latest_state/cdc_sessionize, so they
      keep their scan-fused single pass.

    Round-robin repartition is row-preserving — every declared query's
    result is a row-set, unchanged."""
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    par = spark.sparkContext.defaultParallelism
    try:
        size = os.path.getsize(path)
        import pyarrow.parquet as pq

        n_rows = pq.read_metadata(path).num_rows
        fat_small = size < 64 * 1024 * 1024 and size >= 64 * max(n_rows, 1)
    except OSError:
        fat_small = False
    if fat_small and df.rdd.getNumPartitions() < par:
        df = df.repartition(par * 2)
    return df


# ---- shared SQL fragments (DuckDB) -----------------------------------------

SQL_SLUG = "trim(regexp_replace(lower({x}), '[^a-z0-9]+', '-', 'g'), '-')"
SQL_UNIT = SQL_SLUG.format(x="replace({x}, '£', 'GBP')")
SQL_WORDS = "list_filter(str_split_regex({x}, '[^a-zA-Z0-9]+'), w -> w <> '')"
SQL_CLASSIZE = (
    "array_to_string(list_transform(" + SQL_WORDS + ", w -> upper(w[1]) || lower(w[2:])), '')"
)
SQL_PROPERTIZE = (
    "array_to_string(list_transform("
    + SQL_WORDS
    + ", (w, i) -> CASE WHEN i = 1 THEN lower(w) ELSE upper(w[1]) || lower(w[2:]) END), '')"
)
SQL_TOKENS = "list_filter(str_split_regex(lower({x}), '\\s+'), t -> t <> '')"


def slug_sql(x: str) -> str:
    return SQL_SLUG.format(x=x)


# ---------------------------------------------------------------------------
# The cube fixture over `part`: a measure-dimension cube whose titles map
# through a columns config exercising slugize + unitize (D1/D2/D7/P11/A1).
# ---------------------------------------------------------------------------

CUBE_COLUMNS = [
    ColumnDescriptor("Brand", "brand", "dimension",
                     "http://ex.org/def/dimension/brand", "http://ex.org/def/concept/brands/{brand}", "string", None),
    ColumnDescriptor("Container", "container", "dimension",
                     "http://ex.org/def/dimension/container", "http://ex.org/def/concept/containers/{container}", "string", "slugize"),
    ColumnDescriptor("Measure Type", "measure_type", "dimension",
                     "http://purl.org/linked-data/cube#measureType", "http://ex.org/def/measure/{measure_type}", "string", "slugize"),
    ColumnDescriptor("Unit", "unit", "attribute",
                     "http://ex.org/def/attribute/unit", "http://ex.org/def/unit/{unit}", "string", "unitize"),
    ColumnDescriptor("Retail Price", "retail_price", "measure",
                     "http://ex.org/def/measure/retail-price", None, "number", None),
    ColumnDescriptor("Part Size", "part_size", "measure",
                     "http://ex.org/def/measure/part-size", None, "number", None),
    ColumnDescriptor("Value", "value", "value",
                     "http://ex.org/def/measure/{measure_type}", None, "number", None),
]
CUBE_CONFIG = ColumnsConfig(CUBE_COLUMNS)


def _raw_observations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw observation rows (title-named columns) derived from `part`."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        F.col("p_brand").alias("Brand"),
        F.col("p_name").alias("Container"),
        F.when(F.col("p_partkey") % 2 == 0, F.lit("Retail Price"))
        .otherwise(F.lit("Part Size"))
        .alias("Measure Type"),
        F.when(F.col("p_partkey") % 2 == 0, F.lit("£ thousand"))
        .otherwise(F.lit("Units Sold"))
        .alias("Unit"),
        F.when(F.col("p_partkey") % 2 == 0, F.col("p_retailprice"))
        .otherwise(F.col("p_size").cast("double"))
        .cast("string")
        .alias("Value"),
    )


SQL_RAW_OBS = """
SELECT p_brand AS Brand,
       p_name AS Container,
       CASE WHEN p_partkey % 2 = 0 THEN 'Retail Price' ELSE 'Part Size' END AS "Measure Type",
       CASE WHEN p_partkey % 2 = 0 THEN '£ thousand' ELSE 'Units Sold' END AS Unit,
       CAST(CASE WHEN p_partkey % 2 = 0 THEN p_retailprice ELSE CAST(p_size AS DOUBLE) END AS VARCHAR) AS Value
FROM part
"""

SQL_OBS = f"""
SELECT Brand AS brand,
       {slug_sql('Container')} AS container,
       {slug_sql('"Measure Type"')} AS measure_type,
       {SQL_UNIT.format(x='Unit')} AS unit,
       Value AS value
FROM ({SQL_RAW_OBS})
"""


def q_cube_observations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full cube pipeline pass-1 + pass-2 (D7 transforms, P11
    guards, A1 measure resolution) over the part-derived fixture."""
    raw = _raw_observations(spark, sf_dir)
    cfg = get_cube_configuration(raw, CUBE_CONFIG)
    return cube_pipe.observation_records_df(raw, cfg)


def q_observation_uri(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = _raw_observations(spark, sf_dir)
    cfg = get_cube_configuration(raw, CUBE_CONFIG)
    obs = cube_pipe.observation_records_df(raw, cfg)
    return obs.select(
        cube_pipe.observation_uri_expr("http://ex.org/data/", "parts", cfg).alias("obs_uri"),
        F.col("value"),
    )


def q_uri_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D11: RFC 6570 template expansion — {var} percent-encodes reserved
    characters ('#' -> %23, the reference's integration evidence
    test/table2qb/pipelines/integration_test.clj:57; ' ' -> %20), {+var}
    substitutes raw. Pure Catalyst concat + url_encode fixups."""
    from table2qb_spark.functions.uris import uri_template_expr

    p = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k"),
        F.concat(F.lit("cn#cn8_"), F.col("p_partkey").cast("string")).alias("code"),
        F.col("p_name").alias("label"),
    )
    return p.select(
        "k",
        uri_template_expr(
            "http://ex.org/codes/{code}", {"code": F.col("code")}
        ).alias("encoded_uri"),
        uri_template_expr(
            "http://ex.org/raw/{+code}/def", {"code": F.col("code")}
        ).alias("raw_uri"),
        uri_template_expr(
            "http://ex.org/l/{label}", {"label": F.col("label")}
        ).alias("label_uri"),
        # extended operators (round-4 verdict #6): {#var} fragment expands
        # RAW (its '#' and the value's reserved chars stay literal); {?var}
        # expands to the named ?var=encoded form
        uri_template_expr(
            "http://ex.org/page{#code}", {"code": F.col("code")}
        ).alias("frag_uri"),
        uri_template_expr(
            "http://ex.org/s{?label}", {"label": F.col("label")}
        ).alias("query_uri"),
        # :N prefix modifier (RFC 6570 2.4.1): truncate the VALUE before
        # percent-encoding
        uri_template_expr(
            "http://ex.org/t/{label:7}", {"label": F.col("label")}
        ).alias("trunc_uri"),
    )


def q_typed_observations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9: typed view over the all-string staging observations — each column
    cast to the Spark type of its declared datatype (value: number -> double)
    with the fail-fast guard active."""
    from table2qb_spark.config.typing import typed_view

    raw = _raw_observations(spark, sf_dir)
    cfg = get_cube_configuration(raw, CUBE_CONFIG)
    obs = cube_pipe.observation_records_df(raw, cfg)
    typed = typed_view(obs, cfg)
    return typed.withColumn("value", F.round(F.col("value"), 4))


def q_used_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = _raw_observations(spark, sf_dir)
    cfg = get_cube_configuration(raw, CUBE_CONFIG)
    obs = cube_pipe.observation_records_df(raw, cfg)
    return cube_pipe.used_codes_df(obs, sorted(cfg.dimensions))


def q_component_specifications(spark: SparkSession, sf_dir: str) -> DataFrame:
    raw = _raw_observations(spark, sf_dir)
    cfg = get_cube_configuration(raw, CUBE_CONFIG)
    return cube_pipe.component_specifications_df(spark, cfg)


def q_resolve_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: the distinct scan over the qb:measureType column."""
    raw = _raw_observations(spark, sf_dir)
    return raw.select(F.col("`Measure Type`").alias("measure_title")).distinct()


def q_slug_transforms(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").select(F.col("p_type").alias("raw")).distinct()
    return p.select(
        "raw",
        T.slugize("raw").alias("slug"),
        T.unitize("raw").alias("unit"),
        T.propertize("raw").alias("prop"),
        T.classize("raw").alias("cls"),
    )


def q_codelist_annotate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codelist pipeline over a region/nation hierarchy: regions are top
    concepts, nations their children; Notation defaults to slugize(Label)."""
    region = _t(spark, sf_dir, "region").select(
        F.col("r_name").alias("Label"), F.lit("").alias("Parent Notation")
    )
    nation = (
        _t(spark, sf_dir, "nation")
        .join(_t(spark, sf_dir, "region"), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("n_name").alias("Label"),
            T.slugize("r_name").alias("Parent Notation"),
        )
    )
    src = region.unionByName(nation)
    return codelist_pipe.code_records_df(spark, src).select(
        "label", "notation", "parent_notation", "parent_notation2",
        "top_concept_of", "has_top_concept", "pref_label",
    )


def q_rdf_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDF sink (S6): fully-formatted N-Triples terms for the codelist
    fixture — pins CURIE expansion, the CSVW null rule (broader/narrower/
    topConceptOf conditional per row), literal escaping (descriptions with
    embedded quotes), language tags and xsd:integer-typed sort priorities
    under the driver's hash check."""
    from table2qb_spark.pipelines.rdf import table_level_triples, triples_df

    region = _t(spark, sf_dir, "region").select(
        F.col("r_name").alias("Label"),
        F.lit("").alias("Parent Notation"),
        F.concat(F.lit('The "'), F.col("r_name"), F.lit('" region')).alias("Description"),
        F.col("r_regionkey").cast("string").alias("Sort Priority"),
    )
    nation = (
        _t(spark, sf_dir, "nation")
        .join(_t(spark, sf_dir, "region"), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("n_name").alias("Label"),
            T.slugize("r_name").alias("Parent Notation"),
            F.lit(None).cast("string").alias("Description"),
            F.col("n_nationkey").cast("string").alias("Sort Priority"),
        )
    )
    df = codelist_pipe.code_records_df(spark, region.unionByName(nation))
    uris = codelist_pipe.get_uris("http://ex.org", "geo")
    schema = codelist_pipe.codelist_schema("codelist.csv", "Geography", uris)
    rows = triples_df(df, schema)
    head = spark.createDataFrame(table_level_triples(schema), rows.schema)
    return head.unionByName(rows)


def q_components_annotate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Components pipeline over distinct part containers; Component Type
    assigned deterministically."""
    src = (
        _t(spark, sf_dir, "part")
        .select(F.col("p_name").alias("Label"))
        .distinct()
        .withColumn(
            "Component Type",
            F.element_at(
                F.array(F.lit("Dimension"), F.lit("Measure"), F.lit("Attribute")),
                (F.length("Label") % 3).cast("int") + 1,
            ),
        )
    )
    return components_pipe.component_records_df(spark, src).select(
        "label", "component_type", "notation",
        "component_type_slug", "property_slug", "class_slug", "parent_property",
    )


def q_codelist_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: observation dimension values resolved against a codelist via
    broadcast join; unmatched codes flagged (quarantine candidates)."""
    codelist = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_size") <= 25)
        .select(T.slugize("p_name").alias("notation"))
        .distinct()
    )
    obs = (
        _t(spark, sf_dir, "part")
        .select(T.slugize("p_name").alias("container"))
        .groupBy("container")
        .agg(F.count("*").alias("n_obs"))
    )
    return obs.join(
        F.broadcast(codelist), obs.container == codelist.notation, "left"
    ).select(
        "container",
        "n_obs",
        F.col("notation").isNotNull().alias("resolved"),
    )


# ---------------------------------------------------------------------------
# CDC operators over the events stream table
# ---------------------------------------------------------------------------


def q_cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-seq-wins per key (event_id is the sequence, user_id the key)."""
    from table2qb_spark.cdc.dedup import dedup_max_seq

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").alias("seq"),
        "event_type",
        F.round("value", 4).alias("value"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
    )
    return dedup_max_seq(ev, ["user_id"], seq_col="seq")


def q_cdc_latest_state_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result via the explicit two-phase salted dedup (skew path)."""
    from table2qb_spark.cdc.dedup import dedup_max_seq

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").alias("seq"),
        "event_type",
        F.round("value", 4).alias("value"),
    )
    return dedup_max_seq(ev, ["user_id"], seq_col="seq", two_phase=True)


def q_cdc_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnostic (cdc.dedup.hot_keys): top-25 hottest keys by event
    count with batch share — ties at the cut broken by key so the set is
    deterministic on every engine."""
    from table2qb_spark.cdc.dedup import hot_keys

    return hot_keys(_t(spark, sf_dir, "events"), ["user_id"], top_k=25)


def q_cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE semantics on the event stream: signup=I, error=D, rest=U keyed
    by user_id; final state excludes keys whose last event is a delete."""
    from table2qb_spark.cdc.dedup import dedup_max_seq

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
        F.round("value", 4).alias("value"),
    )
    latest = dedup_max_seq(ev, ["user_id"], seq_col="seq")
    return latest.where(F.col("op") != "D").select("user_id", "seq", "op", "value")


def _patch_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic partial-payload change stream derived from ``events``:
    signup=I, error=D, rest=U keyed by user_id; ``value`` is nulled on every
    3rd event and ``ts_ms`` on every 5th, so patch semantics (null = leave
    untouched on U, null = real null on I) are genuinely exercised on both
    engines."""
    return _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
        F.when(F.col("event_id") % 3 == 0, F.lit(None).cast("double"))
        .otherwise(F.round("value", 4))
        .alias("value"),
        F.when(F.col("event_id") % 5 == 0, F.lit(None).cast("long"))
        .otherwise(F.unix_millis(F.col("ts").cast("timestamp")))
        .alias("ts_ms"),
    )


def q_cdc_patch_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-update merge engine (cdc/patch.py): per-column
    last-non-null-wins over a patch-payload stream, keys whose final event
    is a delete dropped, delete-then-patch revival onto an empty row."""
    from table2qb_spark.cdc.patch import patch_state

    return patch_state(_patch_events(spark, sf_dir), ["user_id"])


def q_cdc_patch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resume/compose property of the patch engine: fold the first half of
    the stream to base state, then patch_merge the second half onto it —
    must equal the one-shot fold (the oracle IS cdc_patch_state's SQL)."""
    from table2qb_spark.cdc.patch import patch_merge, patch_state

    ev = _patch_events(spark, sf_dir)
    lo, hi = ev.agg(F.min("seq"), F.max("seq")).first()
    thr = (lo + hi) // 2  # one tiny scalar agg on the driver, like seq_bounds
    base = patch_state(ev.where(F.col("seq") <= thr), ["user_id"])
    return patch_merge(base, ev.where(F.col("seq") > thr), ["user_id"])


def q_cdc_patch_lake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Patch engine through the LAKE (lake/merge.py::merge_patch): replay
    the partial-payload stream in two bucket-pruned COW batches into a
    temp lake table and read the final state — must equal the one-shot
    operator fold (shares cdc_patch_state's oracle SQL)."""
    import tempfile

    from table2qb_spark.lake.merge import merge_patch
    from table2qb_spark.lake.table import LakeTable

    ev = _patch_events(spark, sf_dir)
    b = ev.agg(F.min("seq").alias("lo"), F.max("seq").alias("hi")).collect()[0]
    mid = (int(b["lo"]) + int(b["hi"])) // 2
    t = LakeTable.create(
        spark,
        tempfile.mkdtemp(prefix="q_patch_"),
        [
            ("user_id", "long"),
            ("seq", "long"),
            ("value", "double"),
            ("ts_ms", "long"),
        ],
        ["user_id"],
        n_buckets=8,
    )
    merge_patch(t, ev.where(F.col("seq") <= mid), "p1")
    merge_patch(t, ev.where(F.col("seq") > mid), "p2")
    return t.read().select("user_id", "seq", "value", "ts_ms")


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (ops/scrub.py) over documents with deterministic
    planted PII (the synthetic corpus has none): every 10th doc gains an
    email + IP, every 7th a phone — both engines build the identical input,
    then scrub with the identical RE2-safe patterns."""
    from table2qb_spark.ops.scrub import scrub_documents

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 10 == 0,
                F.concat(
                    F.lit(" contact: user"), F.col("doc_id").cast("string"),
                    F.lit("@example.com at 10.0.0."),
                    (F.col("doc_id") % 255).cast("string"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.lit(" call +1-555-01"), F.col("doc_id").cast("string")),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return scrub_documents(docs)



def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals over word 3-grams (ops/text.py):
    per-doc duplicate-gram fraction and duplicate-gram character fraction —
    a pure per-row projection, zero shuffle."""
    from table2qb_spark.ops.text import repetition_metrics_exprs, word_ngrams_expr

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        *repetition_metrics_exprs(word_ngrams_expr(F.col("text"), 3), "gram3"),
    )



def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-split sequence packing (ops/packing.py) per source shard,
    1024-token sequences, n_chars as the token-count column; emits each
    doc's span in every sequence it overlaps."""
    from table2qb_spark.ops.packing import pack_sequences

    return pack_sequences(
        _t(spark, sf_dir, "documents"),
        seq_len=1024,
        n_tokens_col="n_chars",
        shard_col="source",
    )



def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (ops/decontam.py): flag corpus docs sharing
    any word 4-gram with the 'benchmark' slice (doc_id % 50 == 0), counting
    distinct shared shingles. Broadcast containment join — no self-join."""
    from table2qb_spark.ops.decontam import ngram_contamination

    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 50 == 0)
    return ngram_contamination(docs, bench, n=4)



def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval over documents for a fixed bag-of-words query
    (ops/retrieval.py) — query-term-pruned on-the-fly inverted index."""
    from table2qb_spark.ops.retrieval import bm25_topk

    return bm25_topk(
        _t(spark, sf_dir, "documents"),
        ["data", "model", "training"],
        k=15,
    )



def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (training-data mixing): per-lang
    keep fractions via an engine-independent md5 draw — the oracle selects
    the EXACT same rows (a Bernoulli sample never could)."""
    from table2qb_spark.ops.sampling import sample_stratified

    docs = _t(spark, sf_dir, "documents")
    out = sample_stratified(
        docs,
        strata_col="lang",
        fractions={"en": 0.5, "de": 0.25, "fr": 0.1},
        key_col="doc_id",
        seed=7,
        default_fraction=0.05,
    )
    return out.select("doc_id", "lang", "source", "n_chars")



def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per doc (ops.retrieval.tfidf_keywords); the
    ranking orders on the ROUNDED score so both engines resolve ties
    identically (term ascending breaks exact ties)."""
    from table2qb_spark.ops.retrieval import tfidf_keywords

    return tfidf_keywords(_t(spark, sf_dir, "documents"), m=3)


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-fit bigram LM quality proxy (ops.text.bigram_logprob): mean
    -log2 P(w2|w1) per doc with a 500-token vocab and add-0.5 smoothing —
    the CCNet perplexity-filter shape, self-contained. The oracle refits
    the identical model in DuckDB."""
    from table2qb_spark.ops.text import bigram_logprob

    docs = _t(spark, sf_dir, "documents")
    return bigram_logprob(docs, vocab_k=500, alpha=0.5)


def q_select_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-constrained corpus selection (ops.sampling.select_token_budget):
    best docs by quality until a 10k-token budget; the histogram+boundary
    two-phase plan must select the EXACT rows of the oracle's global
    running-sum window."""
    from table2qb_spark.ops.sampling import select_token_budget
    from table2qb_spark.ops.text import analyze_documents

    docs = _t(spark, sf_dir, "documents")
    ann = analyze_documents(docs).select("doc_id", "quality", "n_tokens")
    return select_token_budget(ann, budget_tokens=10_000)


def q_cap_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source volume cap (ops.sampling.cap_sources): domain balancing —
    each source keeps ~15 rows in expectation via the per-source integer
    threshold min(SCALE, 15*SCALE div n_s) over the deterministic md5 draw.
    The oracle reproduces the exact kept set."""
    from table2qb_spark.ops.sampling import cap_sources

    docs = _t(spark, sf_dir, "documents")
    out = cap_sources(docs, source_col="source", max_rows=15, key_col="doc_id", seed=13)
    return out.select("doc_id", "lang", "source", "n_chars")


def q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture materialization (ops.sampling.mix_corpus):
    per-lang epoch weights — en x1.5 (one full epoch + a half), de x2.0
    (two full epochs), fr x0.25 (quarter subsample), everything else
    dropped. The oracle reproduces the exact (row, epoch) multiset."""
    from table2qb_spark.ops.sampling import mix_corpus

    docs = _t(spark, sf_dir, "documents")
    out = mix_corpus(
        docs,
        strata_col="lang",
        weights={"en": 1.5, "de": 2.0, "fr": 0.25},
        key_col="doc_id",
        seed=11,
        default_weight=0.0,
    )
    return out.select("doc_id", "lang", "source", "n_chars", "epoch")


def q_cdc_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction invariance (lake/compact.py): replay the event
    stream in two batches (two file generations per touched bucket), compact
    every bucket, and return the final state — which must hash-equal the
    plain replay oracle (compaction is semantically invisible)."""
    import tempfile

    from table2qb_spark.lake.compact import compact
    from table2qb_spark.lake.merge import merge_upsert
    from table2qb_spark.lake.table import LakeTable

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("seq"),
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
        F.round("value", 4).alias("value"),
    )
    b = ev.agg(F.min("seq").alias("lo"), F.max("seq").alias("hi")).collect()[0]
    mid = (int(b["lo"]) + int(b["hi"])) // 2
    t = LakeTable.create(
        spark,
        tempfile.mkdtemp(prefix="q_compact_"),
        [("user_id", "long"), ("seq", "long"), ("op", "string"), ("value", "double")],
        ["user_id"],
        n_buckets=8,
    )
    merge_upsert(t, ev.where(F.col("seq") <= mid), "c1")
    merge_upsert(t, ev.where(F.col("seq") > mid), "c2", batch_size_hint=1)
    res = compact(t, min_files=1)
    assert not res.get("skipped")
    return t.read().select("user_id", "seq", "op", "value")



def q_cdc_mor_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read correctness (lake/mor.py): replay the event stream in
    two MERGE-ON-READ batches — appends + equality-delete files, NO bucket
    rewrites — and return the final state read through the live delete mask
    (deliberately NOT compacted: the mask itself is under test). Must equal
    the plain max-seq-wins winners oracle; deletes are tombstone-less here,
    so a key whose last event is a delete vanishes via its _below_seq
    entry."""
    import tempfile

    from table2qb_spark.lake.mor import merge_mor
    from table2qb_spark.lake.table import LakeTable

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("seq"),
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
        F.round("value", 4).alias("value"),
    )
    b = ev.agg(F.min("seq").alias("lo"), F.max("seq").alias("hi")).collect()[0]
    mid = (int(b["lo"]) + int(b["hi"])) // 2
    t = LakeTable.create(
        spark,
        tempfile.mkdtemp(prefix="q_mor_"),
        [
            ("user_id", "long"),
            ("seq", "long"),
            ("op", "string"),
            ("value", "double"),
            ("_seq", "long"),
        ],
        ["user_id"],
        n_buckets=8,
    )
    merge_mor(t, ev.where(F.col("seq") <= mid), "m1")
    merge_mor(t, ev.where(F.col("seq") > mid), "m2")
    return t.read().select("user_id", "seq", "op", "value")


def _doc_lake(spark: SparkSession, sf_dir: str, prefix: str):
    """A small documents-keyed lake table (doc_id -> lang/source/n_chars)
    for the row-level DML oracles."""
    import tempfile

    from table2qb_spark.lake.table import LakeTable, key_bucket_expr

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    t = LakeTable.create(
        spark,
        tempfile.mkdtemp(prefix=prefix),
        [
            ("doc_id", "long"),
            ("lang", "string"),
            ("source", "string"),
            ("n_chars", "long"),
        ],
        ["doc_id"],
        n_buckets=8,
    )
    df = docs.withColumn("__bucket", key_bucket_expr(["doc_id"], 8))
    files = t.write_data_files(df, "c1")
    t.commit_files("c1", list(files), files)
    return t


def q_cdc_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate DELETE, POSITION-DELETE strategy (lake/dml.py): load the
    documents table into a lake, DELETE WHERE a full-SQL predicate (quoted
    literal + AND — the non-skippable grammar), then read the final state
    through the (file, row-ordinal) anti-join mask. No data file is
    rewritten — Iceberg v2 position deletes re-expressed. The oracle is the
    anti-predicate selection (NULL predicate rows survive, as in SQL
    DELETE)."""
    from table2qb_spark.lake.dml import delete_where

    t = _doc_lake(spark, sf_dir, "q_delete_")
    delete_where(
        t, "lang = 'en' AND n_chars < 200", "d1", strategy="positional"
    )
    return t.read()


def q_cdc_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate UPDATE, copy-on-write (lake/dml.py): SET n_chars =
    n_chars + 1000 WHERE source=src7 (the skippable mini-grammar — the scan
    is stats/bloom-pruned); only buckets holding matches rewrite, other
    rows are carried byte-identical."""
    from table2qb_spark.lake.dml import update_where

    t = _doc_lake(spark, sf_dir, "q_update_")
    update_where(t, "source=src7", {"n_chars": "n_chars + 1000"}, "u1")
    return t.read()


def q_cdc_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic three-clause MERGE INTO (lake/dml.py merge_into): documents
    where doc_id%7==0 arrive as matched source rows (UPDATE n_chars =
    src_n_chars*2, except source='src3' rows which the DELETE clause
    removes); documents where doc_id%13==0 arrive key-shifted by +10^7 as
    unmatched rows (INSERT). Copy-on-write — only source-touched buckets
    rewrite. The oracle is the equivalent LEFT JOIN + ANTI JOIN union."""
    from table2qb_spark.lake.dml import merge_into

    t = _doc_lake(spark, sf_dir, "q_merge_")
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    src = docs.where(F.col("doc_id") % 7 == 0).unionByName(
        docs.where(F.col("doc_id") % 13 == 0).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            "lang",
            "source",
            "n_chars",
        )
    )
    merge_into(
        t,
        src,
        "m1",
        when_matched_update={"n_chars": "src_n_chars * 2"},
        when_matched_delete="source = 'src3'",
        when_not_matched_insert=True,
    )
    return t.read()


def q_cdc_incremental_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats-pruned incremental read (lake/skipping.py): replay the event
    stream into a lake table in two seq-ranged batches, then read back only
    the rows past the midpoint via read(where=...) — file-level manifest
    min/max pruning at plan time plus the real filter over survivors. The
    oracle recomputes the same slice of the latest state in SQL, so the
    pruned read must be indistinguishable from a full filtered scan."""
    import tempfile

    from table2qb_spark.lake.merge import merge_upsert
    from table2qb_spark.lake.table import LakeTable

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("seq"),
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
        F.round("value", 4).alias("value"),
    )
    b = ev.agg(F.min("seq").alias("lo"), F.max("seq").alias("hi")).collect()[0]
    mid = (int(b["lo"]) + int(b["hi"])) // 2
    t = LakeTable.create(
        spark,
        tempfile.mkdtemp(prefix="q_increread_"),
        [("user_id", "long"), ("seq", "long"), ("op", "string"), ("value", "double")],
        ["user_id"],
        n_buckets=8,
    )
    merge_upsert(t, ev.where(F.col("seq") <= mid), "c1")
    merge_upsert(t, ev.where(F.col("seq") > mid), "c2", batch_size_hint=1)
    return t.read(where=[("seq", ">", mid)]).select(
        "user_id", "seq", "op", "value"
    )


def q_cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental change reader (lake/diff.py) driven end-to-end: replay the
    event stream into a REAL lake table in two seq-ranged batches, then
    snapshot_diff between the mid-replay snapshot and the final one. The
    oracle recomputes the same insert/update/delete classification from the
    raw events in SQL (state@mid vs state@end, full outer join)."""
    import tempfile

    from table2qb_spark.lake.diff import snapshot_diff
    from table2qb_spark.lake.merge import merge_upsert
    from table2qb_spark.lake.table import LakeTable

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("seq"),
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
        F.round("value", 4).alias("value"),
    )
    b = ev.agg(F.min("seq").alias("lo"), F.max("seq").alias("hi")).collect()[0]
    mid = (int(b["lo"]) + int(b["hi"])) // 2

    # the table stores the winner's (seq, op, value) per user_id — op/seq are
    # plain value columns here; the merge takes its op/seq from the batch
    t = LakeTable.create(
        spark,
        tempfile.mkdtemp(prefix="q_diff_"),
        [("user_id", "long"), ("seq", "long"), ("op", "string"), ("value", "double")],
        ["user_id"],
        n_buckets=8,
    )
    merge_upsert(t, ev.where(F.col("seq") <= mid), "c1")
    mid_snapshot = t.current_snapshot_id()
    merge_upsert(t, ev.where(F.col("seq") > mid), "c2")
    return snapshot_diff(t, mid_snapshot).select(
        "change_type", "user_id", "seq", "op", "value"
    )


def q_lake_bloom_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned point reads (lake/bloom.py + LakeTable.lookup): load
    documents into a bloom-enabled lake table keyed on doc_id, then
    point-read five fixed keys. Each lookup routes through the bucket
    function to ONE bucket and probes per-file blooms inside it — at 100 TB
    a key probe touches one manifest + typically one file instead of the
    table. The oracle is the same five keys as a plain SQL IN-filter, so a
    single wrongly-pruned file would surface as missing rows."""
    import tempfile

    from table2qb_spark.lake.table import LakeTable, key_bucket_expr

    cols = [
        ("doc_id", "long"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "long"),
    ]
    t = LakeTable.create(
        spark,
        tempfile.mkdtemp(prefix="q_bloom_"),
        cols,
        ["doc_id"],
        n_buckets=8,
        properties={"bloom.columns": "doc_id,source", "bloom.bits": 4096},
    )
    docs = _t(spark, sf_dir, "documents").select(*[c for c, _ in cols])
    dfb = docs.withColumn("__bucket", key_bucket_expr(["doc_id"], 8))
    files = t.write_data_files(dfb, "s2")
    t.commit_files("load", list(files), files)
    picks = [3, 57, 123, 250, 481]  # exist at every SF (>=500 docs)
    out = None
    for p in picks:
        part = t.lookup({"doc_id": p})
        out = part if out is None else out.unionByName(part)
    return out.select("doc_id", "lang", "source", "n_chars", "text")


def q_cdc_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) per user — lag window + running sum."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events").select("user_id", F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"))
    w = Window.partitionBy("user_id").orderBy("ts_ms")
    gap = F.col("ts_ms") - F.lag("ts_ms").over(w)
    marked = ev.withColumn(
        "new_session", F.when(gap.isNull() | (gap > 30 * 60 * 1000), 1).otherwise(0)
    )
    return marked.groupBy("user_id").agg(
        F.sum("new_session").alias("n_sessions"), F.count("*").alias("n_events")
    )


def q_cdc_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join (cdc/asof.py): every click probes the latest
    purchase state at-or-before it for the same user, matches older than 7
    days nulled by the tolerance. Union + running-last plan — one shuffle,
    no range-join explosion (DuckDB oracle: native ASOF LEFT JOIN)."""
    from table2qb_spark.cdc.asof import asof_join

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        F.round("value", 4).alias("value"),
    )
    states = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts_ms")
        .agg(F.max("value").alias("state_value"))
    )
    probes = ev.where(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts_ms"
    )
    return asof_join(
        probes, states, ["user_id"], "ts_ms", "ts_ms",
        tolerance_ms=7 * 86400000,
    )


def q_cdc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history (cdc/history.py) over the same synthesized change
    log as cdc_merge_upsert: every non-delete version with its
    [valid_from_seq, valid_to_seq) interval; deletes close intervals but
    emit no version. Single-shuffle window plan."""
    from table2qb_spark.cdc.history import scd2_history

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
        F.round("value", 4).alias("value"),
    )
    return scd2_history(ev, ["user_id"], seq_col="seq", op_col="op")


def q_cdc_row_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row lineage (cdc/history.py row_lineage): per live key, the current
    incarnation's created_seq / last_updated_seq / n_versions and a
    deterministic md5 row_id over (key, created_seq) — Iceberg v3 row
    lineage derived from the log in one key exchange (window + agg reuse
    the same hash partitioning)."""
    from table2qb_spark.cdc.history import row_lineage

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
    )
    return row_lineage(ev, ["user_id"], seq_col="seq", op_col="op")


def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-grain continuous aggregate (ops/rollup.py): hour/day/total
    counts and value sums, GROUPING-bitmask level column. Hierarchical
    re-aggregation — no Expand over the scan."""
    from table2qb_spark.ops.rollup import time_rollup

    return time_rollup(_t(spark, sf_dir, "events"), "ts", "value")


def q_cdc_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition (event_type) throughput/lag-style metrics rollup."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
        F.min(F.unix_millis(F.col("ts").cast("timestamp"))).alias("first_ms"),
        F.max(F.unix_millis(F.col("ts").cast("timestamp"))).alias("last_ms"),
    )


# ---------------------------------------------------------------------------
# Training-data ops: text / dedup / similarity / multimodal
# ---------------------------------------------------------------------------


def q_text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text.analyze_documents(_t(spark, sf_dir, "documents"))


def q_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate-line removal, oracle-gated: a shared header
    and footer line are injected into every document (plus sentence breaks
    at ' a '), then lines appearing in > 100 docs are dropped. The oracle
    rebuilds the same texts with an ANTI JOIN + ordered list aggregate."""
    from table2qb_spark.ops.text import remove_boilerplate_lines

    docs = _t(spark, sf_dir, "documents")
    structured = docs.select(
        "doc_id",
        F.concat(
            F.lit("shared header line\n"),
            F.regexp_replace(F.col("text"), " a ", "\n"),
            F.lit("\nshared footer line"),
        ).alias("text"),
    )
    return remove_boilerplate_lines(structured, max_line_df=100)


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking with overlap (ops/text.chunk_documents):
    one explode per doc, zero shuffle. 32-token chunks, stride 24."""
    from table2qb_spark.ops.text import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_tokens=32, stride=24
    )


_LICENSE_HEADER = (
    "license apache version two zero granted to all users of this corpus"
)


def q_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-substring span detection (ops/text.repeated_window_spans +
    merge_token_spans — Lee et al.'s exact-substring dedup, window-hash
    approximated): a 12-token license header is planted on every 4th doc
    (the synthetic corpus repeats little), then 8-token windows at stride 4
    are hashed, windows shared by >= 2 docs are kept, and overlapping
    windows merge to [span_start, span_end) token intervals via
    gaps-and-islands. Both engines build the identical planted input."""
    from table2qb_spark.ops.text import merge_token_spans, repeated_window_spans

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit(_LICENSE_HEADER + " "), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    spans = repeated_window_spans(
        docs, window_tokens=8, stride=4, min_df=2
    )
    return merge_token_spans(spans, window_tokens=8)


def q_stratum_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics with EXACT percentiles — the standard
    mixing-report aggregate before sampling ratios are chosen. Spark's
    percentile() and DuckDB's quantile_cont are both exact interpolated
    quantiles, so the hash gate holds (percentile_approx would not).
    Map-side-combinable except the percentile buffers; one shuffle on the
    stratum key. Delegates to ops.sampling.stratum_stats (exact mode — its
    exact=False approx_percentile path is the production escape hatch for
    high-cardinality metrics, tolerance-pinned in pytest rather than
    oracle-gated)."""
    from table2qb_spark.ops.sampling import stratum_stats

    docs = _t(spark, sf_dir, "documents")
    out = stratum_stats(docs, "lang", "n_chars", exact=True)
    # oracle-stable names (the op suffixes with the metric column name)
    return out.toDF(
        "lang", "n_docs", "total_chars", "mean_chars",
        "p50_chars", "p90_chars", "min_chars", "max_chars",
    )


def q_web_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher web-quality gate signals (ops/text.web_quality_exprs). The
    synthetic documents are flat word soup, so both engines first derive a
    STRUCTURED text deterministically (sentence breaks at ' a ', a bullet
    line, per-doc_id ellipsis/hash suffixes) — the metrics then exercise
    every branch, not the degenerate one-line path."""
    from table2qb_spark.ops.text import web_quality_exprs

    docs = _t(spark, sf_dir, "documents")
    structured = F.concat(
        F.lit("- item one\n"),
        F.regexp_replace(F.col("text"), " a ", ".\n"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("\nto be continued...")).otherwise(
            F.lit(".")
        ),
        F.when(F.col("doc_id") % 7 == 0, F.lit("\n# tag {x}")).otherwise(F.lit("")),
    )
    return docs.select("doc_id", *web_quality_exprs(structured))


def q_clean_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style LINE-level cleaning (ops/text.clean_lines_exprs): keep lines
    with terminal punctuation, >= 5 words, and no banned word — one
    shuffle-free projection. Like web_quality, both engines first derive
    structured text deterministically so every branch fires: a bullet line
    (dropped: no terminal punct), sentence breaks at ' a ', a
    javascript-bait line on doc_id%5 (dropped: banned word), a short
    trailing line on doc_id%7 (dropped: < 5 words)."""
    from table2qb_spark.ops.text import clean_lines_exprs

    docs = _t(spark, sf_dir, "documents")
    structured = F.concat(
        F.lit("- item one\n"),
        F.regexp_replace(F.col("text"), " a ", ".\n"),
        F.lit("."),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.lit("\nplease enable javascript to view this page."),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0, F.lit("\nto be continued.")).otherwise(
            F.lit("")
        ),
    )
    return docs.select("doc_id", *clean_lines_exprs(structured))


def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc unigram Shannon entropy (ops/text.token_entropy_expr) —
    run-length counts over the sorted token array, one shuffle-free
    projection; a classic repetitive-noise quality signal."""
    from table2qb_spark.ops.text import token_entropy_expr

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", token_entropy_expr(F.col("text")).alias("entropy_bits")
    )


def q_prep_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END prep composite (round-4 verdict #3): exact-dedup ->
    benchmark decontamination -> quality/length gates -> stratified sample
    -> sequence packing, exactly the ONE fused plan that
    prepare_training_data builds (ops/prep.py) — the flagship `prep-data`
    user surface, oracle-gated as a whole rather than stage by stage.
    Returns the packing index of the surviving corpus; every surviving
    doc_id and its span is sensitive to every upstream stage, so a hash
    match certifies the entire chain. Reference analog: the integration
    test's multi-pipeline build
    (/root/reference/test/table2qb/pipelines/integration_test.clj:13-74)."""
    from table2qb_spark.ops.prep import prepare_training_data

    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 50 == 0)
    _clean, packed = prepare_training_data(
        docs,
        benchmark=bench,
        min_quality=0.3,
        min_tokens=5,
        fractions={"en": 0.5, "de": 0.25, "fr": 0.1},
        seq_len=512,
        decontam_n=4,
        seed=7,
    )
    return packed


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", text.fingerprint_expr(F.col("text")).alias("text")
    )
    # exact dedup over the canonical fingerprint (bag-of-tokens identity)
    return dedup.exact_dedup(docs, text_col="text", id_col="doc_id")


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.lsh_candidate_pairs(
        _t(spark, sf_dir, "documents"), k=8, bands=4, n=3
    )


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), n=3, threshold=0.2
    )


def q_dedup_span_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    # exact-substring-dedup approximation: positions covered by corpus-hot
    # trigrams (max_df=2 so the synthetic fixture's repeated sentence
    # templates light up)
    return dedup.duplicated_ngram_spans(
        _t(spark, sf_dir, "documents"), n=3, max_df=2
    )


def q_dedup_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-group mapping: every doc -> its group's keeper (min id per
    content hash) — the row-level companion to dedup_exact that a pipeline
    joins on to DROP duplicates. One window over the content hash."""
    from pyspark.sql.window import Window

    docs = _t(spark, sf_dir, "documents")
    h = F.md5(F.col("text"))
    keeper = F.min("doc_id").over(Window.partitionBy(h))
    return docs.select(
        "doc_id",
        keeper.alias("keeper_id"),
        (F.col("doc_id") != keeper).alias("is_duplicate"),
    )



def q_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive near-dup groups: MinHash-LSH candidate pairs closed into
    connected components by iterative min-label propagation
    (ops/dedup.duplicate_groups). The oracle computes the same fixpoint with
    a DuckDB recursive CTE — different algorithm, same answer."""
    pairs = dedup.lsh_candidate_pairs(
        _t(spark, sf_dir, "documents"), k=8, bands=4, n=3
    )
    return dedup.duplicate_groups(pairs)


def q_dedup_groups_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same transitive groups as ``dedup_groups`` but via the alternating
    large-star/small-star contraction (ops/dedup.star_groups) — the
    diameter-independent path duplicate_groups escalates to for deep
    components. Shares dedup_groups' recursive-CTE oracle: THREE independent
    algorithms (min-label, star contraction, transitive closure) must agree
    on the same fixpoint."""
    pairs = dedup.lsh_candidate_pairs(
        _t(spark, sf_dir, "documents"), k=8, bands=4, n=3
    )
    return dedup.star_groups(pairs)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_dedup(_t(spark, sf_dir, "documents"), bits=60)


def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-LSH candidate pairs: docs sharing >=1 of 4 15-bit simhash
    bands (covers all pairs within Hamming distance 3)."""
    return dedup.simhash_candidate_pairs(
        _t(spark, sf_dir, "documents"), bits=60, bands=4
    )


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return ann.cosine_topk(emb, queries, k=3)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    centroids = ann.seed_centroids(emb, n=4)
    queries = emb.where((F.col("vec_id") >= 5) & (F.col("vec_id") < 10))
    return ann.ivf_topk(emb, queries, centroids, k=3)


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IVF-partitioned pairing (equi-join on centroid_id — the scale path);
    # threshold chosen so the fixture yields non-empty output (synthetic
    # 64-dim embeddings top out around cosine 0.51). Seed centroids are
    # passed EXPLICITLY so DuckDB can replicate the assignment exactly;
    # production default is kmeans_centroids (data-aware).
    emb = _t(spark, sf_dir, "embeddings")
    return ann.cosine_neardup_pairs(
        emb, threshold=0.35, centroids=ann.seed_centroids(emb, 8)
    )


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # SemDeDup keep-one-per-epsilon-neighborhood over the same IVF cells
    # and threshold as embedding_neardup (synthetic 64-dim embeddings top
    # out around cosine 0.51, so 0.35 plays the paper's 1-eps role here).
    emb = _t(spark, sf_dir, "embeddings")
    return ann.semantic_dedup(
        emb, threshold=0.35, centroids=ann.seed_centroids(emb, 8)
    )


def q_dedup_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cross-corpus dedup (ops/dedup.cross_dedup): the batch
    slice (doc_id % 3 == 0) deduped against the rest of the corpus over
    the canonical fingerprint — distinct-hash anti-join + within-batch
    min-id collapse, the per-batch dedup stage of a continuously-ingesting
    CDC pipeline."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", text.fingerprint_expr(F.col("text")).alias("text")
    )
    incoming = docs.where(F.col("doc_id") % 3 == 0)
    existing = docs.where(F.col("doc_id") % 3 != 0)
    return dedup.cross_dedup(incoming, existing)


def q_dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level duplicate-paragraph removal (ops/text.dedup_paragraphs,
    CCNet/RefinedWeb prep stage): keep only the FIRST occurrence of every
    paragraph corpus-wide and rebuild each doc's text. The synthetic docs
    are one-line word soup, so paragraph breaks are derived at ' a '
    (same trick as boilerplate_removal) in both engines."""
    from table2qb_spark.ops.text import dedup_paragraphs

    docs = _t(spark, sf_dir, "documents")
    structured = docs.select(
        "doc_id", F.regexp_replace(F.col("text"), " a ", "\n").alias("text")
    )
    return dedup_paragraphs(structured, sep="\n")


def _synthetic_url_expr() -> "F.Column":
    """Deterministic messy URL per document (no URL column in the testdata):
    50 canonical pages (g = doc_id % 50), each crawled under many raw
    variants — scheme/host case noise, ``www.``, default vs explicit ports,
    tracking query parameters in shuffled order, fragments, trailing
    slashes. Canonical-determining parts depend only on g; noise depends on
    doc_id, so ~10 raws per canonical at sf0.01. The oracle builds the
    byte-identical string in SQL (_SYNTH_URL_SQL)."""
    doc = F.col("doc_id")
    g = doc % 50
    is_http = (g % 3) == 0
    scheme = F.when(
        is_http, F.when(doc % 2 == 0, "HTTP").otherwise("http")
    ).otherwise(F.when(doc % 2 == 0, "HTTPS").otherwise("https"))
    tld = F.element_at(
        F.array(F.lit("com"), F.lit("co.uk"), F.lit("org"), F.lit("com.au")),
        (g % 4 + 1).cast("int"),
    )
    host_core = F.concat(
        F.when(g % 2 == 0, "cdn.").otherwise(""),
        F.lit("site-"), g.cast("string"), F.lit("."), tld,
    )
    host = F.concat(
        F.when(doc % 3 == 0, "www.").otherwise(""),
        F.when(doc % 4 == 0, F.upper(host_core)).otherwise(host_core),
    )
    port = (
        F.when(g % 7 == 0, ":8080")
        .when(doc % 5 == 0, F.when(is_http, ":80").otherwise(":443"))
        .otherwise("")
    )
    path = F.concat(
        F.lit("/docs/"), g.cast("string"),
        F.when(doc % 6 == 0, "/").otherwise(""),
    )
    query = F.when(
        g % 5 == 0, F.when(doc % 2 == 1, "?utm_source=x").otherwise("")
    ).otherwise(
        F.element_at(
            F.array(
                F.lit("?b=2&utm_source=feed&a=1"),
                F.lit("?a=1&b=2&gclid=xyz"),
                F.lit("?b=2&a=1"),
            ),
            (doc % 3 + 1).cast("int"),
        )
    )
    frag = F.when(
        doc % 2 == 1, F.concat(F.lit("#s"), (doc % 3).cast("string"))
    ).otherwise("")
    return F.concat(scheme, F.lit("://"), host, port, path, query, frag)


def q_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + registered domain (ops/web): one Catalyst
    projection — parse_url split, case/port/fragment/tracking-param
    normalization, PSL-lite eTLD+1. Zero shuffle."""
    from table2qb_spark.ops.web import registered_domain_expr, url_normalize_expr

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _synthetic_url_expr().alias("url")
    )
    norm = url_normalize_expr(F.col("url"))
    host = F.regexp_replace(
        F.lower(F.parse_url(F.col("url"), F.lit("HOST"))), r"^www\.", ""
    )
    return docs.select(
        "doc_id",
        "url",
        norm.alias("url_norm"),
        registered_domain_expr(host).alias("domain"),
    )


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level exact dedup (ops/web.url_dedup): one row per canonical URL
    with min-id keeper + copy count — a single map-side-combinable
    aggregate, no window."""
    from table2qb_spark.ops.web import url_dedup

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _synthetic_url_expr().alias("url")
    )
    return url_dedup(docs)


# word-keyed lexicon model for the oracle-gated scorer: every weight is an
# exact binary fraction (k/16), so both engines' left folds produce the
# bit-identical z and the rounded sigmoid can never straddle a boundary
_QC_MODEL = {
    "weights": {"fast": 0.75, "slow": -0.625, "merge": 0.5,
                "hash": -0.25, "spark": 0.125},
    "intercept": -0.0625,
    "num_buckets": None,
}


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring (ops/classifier.py — the fastText/CCNet
    quality-filter stage): sigmoid(intercept + per-token weight sum) as one
    Catalyst projection (map literal + aggregate fold, zero shuffle). The
    oracle-gated form uses a word-keyed lexicon; the hashed-bucket form is
    pytest-gated against MLlib's own transform probabilities."""
    from table2qb_spark.ops.classifier import score_quality

    docs = _t(spark, sf_dir, "documents")
    return score_quality(docs, _QC_MODEL).select(
        "doc_id", F.round("quality_prob", 6).alias("quality_prob")
    )


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary report (ops/text.vocab_topk): top-30 tokens by
    corpus term frequency with document frequency — two map-side-combined
    aggregates + TakeOrderedAndProject, total (tf, df, token) order so the
    k-boundary is deterministic."""
    from table2qb_spark.ops.text import vocab_topk

    return vocab_topk(_t(spark, sf_dir, "documents"), k=30)


def q_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training-data export
    (ops/sampling.assign_shards): md5-draw shard in [0,8) + in-shard
    position, a pure function of (doc_id, seed) — reproducible sharding
    on any engine at any parallelism."""
    from table2qb_spark.ops.sampling import assign_shards

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return assign_shards(docs, n_shards=8, key_col="doc_id", seed=7)


def q_embedding_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination
    (ops/decontam.embedding_contamination): corpus vectors (vec_id % 10
    != 0) within cosine 0.35 of any 'benchmark' vector (vec_id % 10 == 0),
    matched through the same 8 seed-centroid IVF cells as
    embedding_neardup — semantic leakage that n-gram collision misses."""
    from table2qb_spark.ops.decontam import embedding_contamination

    emb = _t(spark, sf_dir, "embeddings")
    bench = emb.where(F.col("vec_id") % 10 == 0)
    corpus = emb.where(F.col("vec_id") % 10 != 0)
    return embedding_contamination(
        corpus, bench, threshold=0.35, centroids=ann.seed_centroids(emb, 8)
    )


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    media = multimodal.to_media_df(docs, "doc_id", "payload", "blob")
    return media.select("media_id", "kind", "byte_len", "sha256")


def q_multimodal_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL header decode, oracle-gated: per-document PNG header bytes are
    synthesized JVM-side (signature + IHDR with big-endian dims via
    hex/unhex), then parsed back by the pure-Python container-header decoder
    (ops/multimodal.image_dims) through the distributed mapInPandas stage.
    The oracle recomputes the dims from the same doc_id formula — so a parse
    bug (endianness, offset) breaks the hash."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        ((F.col("doc_id") % 192) + 1).cast("int").alias("w"),
        ((F.col("doc_id") % 96) + 1).cast("int").alias("h"),
    )

    def be4(c: Column) -> Column:
        return F.unhex(F.lpad(F.hex(c), 8, "0"))

    payload = F.concat(
        F.lit(bytes.fromhex("89504E470D0A1A0A0000000D")),  # signature + IHDR len
        F.lit(b"IHDR"),
        be4(F.col("w")),
        be4(F.col("h")),
        F.lit(bytes(5)),  # bit depth / color / compression / filter / interlace
    )
    media = multimodal.to_media_df(
        docs.withColumn("payload", payload), "doc_id", "payload", "image"
    )
    out = multimodal.decode_media(media)  # headers mode: real byte parse
    return out.select(
        "media_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("n_frames").cast("long").alias("n_frames"),
    )


def q_multimodal_av_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio/video container-header decode, oracle-gated like
    multimodal_headers: per-document RIFF/WAVE (even ids) and ISO-BMFF MP4
    (odd ids) bytes are synthesized JVM-side with doc_id-derived sample
    rate / frame count / track dims, then parsed back by the pure-Python
    header decoders (ops/multimodal.wav_meta / mp4_meta) through the
    distributed mapInPandas stage. The oracle recomputes the metadata from
    the same formulas — an endianness/offset bug in either parser breaks
    the hash. Reference analog: the decode seam the reference leaves to
    csv2rdf-side tooling; here it is a first-class training-data op."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")

    def be4(c: Column) -> Column:
        return F.unhex(F.lpad(F.hex(c), 8, "0"))

    def le4(c: Column) -> Column:
        hx = F.lpad(F.hex(c), 8, "0")
        return F.unhex(
            F.concat(
                F.substring(hx, 7, 2), F.substring(hx, 5, 2),
                F.substring(hx, 3, 2), F.substring(hx, 1, 2),
            )
        )

    def le2(c: Column) -> Column:
        hx = F.lpad(F.hex(c), 4, "0")
        return F.unhex(F.concat(F.substring(hx, 3, 2), F.substring(hx, 1, 2)))

    def be_lit(n: int) -> Column:
        return F.lit(n.to_bytes(4, "big"))

    sr = (F.col("doc_id") % 6 + 1) * 8000
    wav_frames = F.col("doc_id") % 100 + 1
    base = docs.withColumn("data_size", (wav_frames * 2).cast("int"))
    wav = F.concat(
        F.lit(b"RIFF"), le4(F.col("data_size") + 36), F.lit(b"WAVEfmt "),
        le4(F.lit(16)), le2(F.lit(1)), le2(F.lit(1)),  # PCM, mono
        le4(sr), le4(sr * 2), le2(F.lit(2)), le2(F.lit(16)),
        F.lit(b"data"), le4(F.col("data_size")),
        F.unhex(F.expr("repeat('00', data_size)")),
    )
    # fixed-size ISO-BMFF skeleton: ftyp(16) + moov(260) = mvhd(108) +
    # trak(144) = tkhd(92) + mdia(44)/minf(36)/stbl(28)/stsz(20)
    vw, vh = F.col("doc_id") % 640 + 16, F.col("doc_id") % 360 + 16
    vframes = (F.col("doc_id") % 300 + 1).cast("int")
    mp4 = F.concat(
        be_lit(16), F.lit(b"ftypisom"), F.lit(bytes(4)),
        be_lit(260), F.lit(b"moov"),
        be_lit(108), F.lit(b"mvhd"), F.lit(bytes(12)),
        be_lit(1000), be_lit(5000), F.lit(bytes(80)),
        be_lit(144), F.lit(b"trak"),
        be_lit(92), F.lit(b"tkhd"), F.lit(bytes(40 + 36)),
        be4((vw * 65536).cast("long")), be4((vh * 65536).cast("long")),
        be_lit(44), F.lit(b"mdia"), be_lit(36), F.lit(b"minf"),
        be_lit(28), F.lit(b"stbl"),
        be_lit(20), F.lit(b"stsz"), F.lit(bytes(8)), be4(vframes),
    )
    payload = F.when(F.col("doc_id") % 2 == 0, wav).otherwise(mp4)
    kind = F.when(F.col("doc_id") % 2 == 0, F.lit("audio")).otherwise(
        F.lit("video")
    )
    media = base.select(
        F.col("doc_id").cast("long").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.length(payload).cast("int").alias("byte_len"),
        F.sha2(payload, 256).alias("sha256"),
    )
    out = multimodal.decode_media(media)  # headers mode: real byte parse
    return out.select(
        "media_id", "kind",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("n_frames").cast("long").alias("n_frames"),
        F.col("sample_rate").cast("long").alias("sample_rate"),
    )


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3).cast("int") + 1,
        ).alias("kind"),
    )
    media = docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        "kind",
        "payload",
        F.length("payload").cast("int").alias("byte_len"),
        F.sha2("payload", 256).alias("sha256"),
    )
    out = multimodal.decode_media(media, fake=True)
    return out.select(
        "media_id", "kind", "byte_len", "width", "height", "n_frames", "sample_rate"
    )


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation-path check (TPC-H Q1 shape) — the numeric-cast layer the
    typed cube view uses."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Oracle SQL (DuckDB dialect-compatible ANSI)
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 60  # token hash = 15 md5 hex chars: positive in signed int64
_SIMHASH_BIT_SUMS = ",\n       ".join(
    f"""CASE WHEN list_sum(list_transform(toks, t -> CASE WHEN (('0x' || substr(md5(t),1,15))::BIGINT // {2**j}) % 2 = 1 THEN 1 ELSE -1 END)) > 0 THEN {2**j} ELSE 0 END AS bit{j}"""
    for j in range(_SIMHASH_BITS)
)
_SIMHASH_SUM = " + ".join(f"bit{j}" for j in range(_SIMHASH_BITS))

ORACLES: dict[str, str] = {
    "cube_observations": SQL_OBS,
    "uri_expand": """
        SELECT p_partkey AS k,
               'http://ex.org/codes/' || replace(replace('cn#cn8_' || CAST(p_partkey AS VARCHAR), '#', '%23'), ' ', '%20') AS encoded_uri,
               'http://ex.org/raw/cn#cn8_' || CAST(p_partkey AS VARCHAR) || '/def' AS raw_uri,
               'http://ex.org/l/' || replace(p_name, ' ', '%20') AS label_uri,
               'http://ex.org/page#cn#cn8_' || CAST(p_partkey AS VARCHAR) AS frag_uri,
               'http://ex.org/s?label=' || replace(p_name, ' ', '%20') AS query_uri,
               'http://ex.org/t/' || replace(substr(p_name, 1, 7), ' ', '%20') AS trunc_uri
        FROM part
    """,
    "typed_observations": f"""
        SELECT brand, container, measure_type, unit,
               round(CAST(value AS DOUBLE), 4) AS value
        FROM ({SQL_OBS})
    """,
    "observation_uri": f"""
        SELECT 'http://ex.org/data/parts' || '/' || brand || '/' || container || '/' || measure_type AS obs_uri,
               value
        FROM ({SQL_OBS})
    """,
    "used_codes": f"""
        WITH obs AS ({SQL_OBS})
        SELECT 'brand' AS component, brand AS code FROM obs GROUP BY 2
        UNION ALL SELECT 'container', container FROM obs GROUP BY 2
        UNION ALL SELECT 'measure_type', measure_type FROM obs GROUP BY 2
    """,
    "component_specifications": """
        SELECT * FROM (VALUES
          ('brand', 'qb:dimension', 'http://ex.org/def/dimension/brand'),
          ('container', 'qb:dimension', 'http://ex.org/def/dimension/container'),
          ('measure_type', 'qb:dimension', 'http://purl.org/linked-data/cube#measureType'),
          ('unit', 'qb:attribute', 'http://ex.org/def/attribute/unit'),
          ('part_size', 'qb:measure', 'http://ex.org/def/measure/part-size'),
          ('retail_price', 'qb:measure', 'http://ex.org/def/measure/retail-price')
        ) AS t(component_slug, component_attachment, component_property)
    """,
    "resolve_measures": f"""
        SELECT DISTINCT "Measure Type" AS measure_title FROM ({SQL_RAW_OBS})
    """,
    "slug_transforms": f"""
        SELECT raw,
               {SQL_SLUG.format(x='raw')} AS slug,
               {SQL_UNIT.format(x='raw')} AS unit,
               {SQL_PROPERTIZE.format(x='raw')} AS prop,
               {SQL_CLASSIZE.format(x='raw')} AS cls
        FROM (SELECT DISTINCT p_type AS raw FROM part)
    """,
    "codelist_annotate": f"""
        WITH src AS (
          SELECT r_name AS label, '' AS parent FROM region
          UNION ALL
          SELECT n_name, {slug_sql('r_name')} FROM nation JOIN region ON n_regionkey = r_regionkey
        )
        SELECT label,
               {slug_sql('label')} AS notation,
               parent AS parent_notation,
               parent AS parent_notation2,
               CASE WHEN trim(parent) = '' THEN 'yes' ELSE '' END AS top_concept_of,
               CASE WHEN trim(parent) = '' THEN 'yes' ELSE '' END AS has_top_concept,
               label AS pref_label
        FROM src
    """,
    "rdf_triples": f"""
        WITH src AS (
          SELECT r_name AS label, '' AS parent,
                 'The "' || r_name || '" region' AS description,
                 CAST(r_regionkey AS VARCHAR) AS sp
          FROM region
          UNION ALL
          SELECT n_name, {slug_sql('r_name')}, NULL, CAST(n_nationkey AS VARCHAR)
          FROM nation JOIN region ON n_regionkey = r_regionkey
        ),
        ann AS (
          SELECT label, {slug_sql('label')} AS notation, parent,
                 replace(replace(description, '\\', '\\\\'), '"', '\\"') AS description,
                 sp,
                 CASE WHEN trim(parent) = '' THEN 'yes' ELSE '' END AS tc
          FROM src
        ),
        t AS (
          SELECT *,
                 '<http://ex.org/def/concept/geo/' || notation || '>' AS code,
                 '<http://ex.org/def/concept/geo/' || parent || '>' AS parent_code,
                 '<http://ex.org/def/concept-scheme/geo>' AS scheme
          FROM ann
        )
        SELECT '<http://ex.org/def/concept-scheme/geo>' AS subject,
               '<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>' AS predicate,
               '<http://www.w3.org/2004/02/skos/core#ConceptScheme>' AS object
        UNION ALL SELECT scheme, '<http://www.w3.org/2000/01/rdf-schema#label>', '"Geography"@en' FROM (SELECT DISTINCT scheme FROM t)
        UNION ALL SELECT scheme, '<http://purl.org/dc/terms/title>', '"Geography"@en' FROM (SELECT DISTINCT scheme FROM t)
        UNION ALL SELECT code, '<http://www.w3.org/2000/01/rdf-schema#label>', '"' || label || '"@en' FROM t
        UNION ALL SELECT code, '<http://www.w3.org/2004/02/skos/core#notation>', '"' || notation || '"@en' FROM t
        UNION ALL SELECT code, '<http://www.w3.org/2004/02/skos/core#broader>', parent_code FROM t WHERE trim(parent) <> ''
        UNION ALL SELECT parent_code, '<http://www.w3.org/2004/02/skos/core#narrower>', code FROM t WHERE trim(parent) <> ''
        UNION ALL SELECT code, '<http://www.w3.org/ns/ui#sortPriority>', '"' || sp || '"^^<http://www.w3.org/2001/XMLSchema#integer>' FROM t WHERE sp IS NOT NULL AND trim(sp) <> ''
        UNION ALL SELECT code, '<http://www.w3.org/2000/01/rdf-schema#comment>', '"' || description || '"@en' FROM t WHERE description IS NOT NULL AND trim(description) <> ''
        UNION ALL SELECT code, '<http://www.w3.org/2004/02/skos/core#topConceptOf>', scheme FROM t WHERE tc = 'yes'
        UNION ALL SELECT scheme, '<http://www.w3.org/2004/02/skos/core#hasTopConcept>', code FROM t WHERE tc = 'yes'
        UNION ALL SELECT code, '<http://www.w3.org/2004/02/skos/core#prefLabel>', '"' || label || '"@en' FROM t
        UNION ALL SELECT code, '<http://www.w3.org/2004/02/skos/core#inScheme>', scheme FROM t
        UNION ALL SELECT code, '<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>', '<http://www.w3.org/2004/02/skos/core#Concept>' FROM t
    """,
    "components_annotate": f"""
        WITH src AS (
          SELECT label,
                 CASE length(label) % 3 WHEN 0 THEN 'Dimension' WHEN 1 THEN 'Measure' ELSE 'Attribute' END AS ct
          FROM (SELECT DISTINCT p_name AS label FROM part)
        )
        SELECT label,
               CASE ct WHEN 'Dimension' THEN 'qb:DimensionProperty' WHEN 'Measure' THEN 'qb:MeasureProperty' ELSE 'qb:AttributeProperty' END AS component_type,
               {slug_sql('label')} AS notation,
               lower(ct) AS component_type_slug,
               {SQL_PROPERTIZE.format(x='label')} AS property_slug,
               {SQL_CLASSIZE.format(x='label')} AS class_slug,
               CASE WHEN ct = 'Measure' THEN 'http://purl.org/linked-data/sdmx/2009/measure#obsValue' END AS parent_property
        FROM src
    """,
    "codelist_resolution": f"""
        WITH codelist AS (
          SELECT DISTINCT {slug_sql('p_name')} AS notation FROM part WHERE p_size <= 25
        ),
        obs AS (
          SELECT {slug_sql('p_name')} AS container, count(*) AS n_obs FROM part GROUP BY 1
        )
        SELECT container, n_obs, notation IS NOT NULL AS resolved
        FROM obs LEFT JOIN codelist ON container = notation
    """,
    "cdc_latest_state": """
        SELECT user_id, seq, event_type, value, ts_ms FROM (
          SELECT user_id, event_id AS seq, event_type, round(value, 4) AS value,
                 epoch_ms(ts) AS ts_ms,
                 row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          FROM events
        ) WHERE rn = 1
    """,
    "cdc_latest_state_salted": """
        SELECT user_id, seq, event_type, value FROM (
          SELECT user_id, event_id AS seq, event_type, round(value, 4) AS value,
                 row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          FROM events
        ) WHERE rn = 1
    """,
    "cdc_hot_keys": """
        WITH c AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id),
        t AS (SELECT sum(n_events) AS total FROM c)
        SELECT user_id, n_events,
               round(n_events / total * 100.0, 4) AS pct_of_batch
        FROM c CROSS JOIN t
        ORDER BY n_events DESC, user_id
        LIMIT 25
    """,
    "lake_bloom_lookup": """
        SELECT doc_id, lang, source, n_chars, text
        FROM documents
        WHERE doc_id IN (3, 57, 123, 250, 481)
    """,
    "cdc_merge_upsert": """
        SELECT user_id, seq, op, value FROM (
          SELECT user_id, event_id AS seq,
                 CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D' ELSE 'U' END AS op,
                 round(value, 4) AS value,
                 row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          FROM events
        ) WHERE rn = 1 AND op <> 'D'
    """,
    # Patch (partial-update) merge engine: DuckDB replica of the same
    # one-aggregate algebra — per column, winner = max-seq authoritative
    # setter, voided if it precedes the last row-image boundary (s_star);
    # key dead iff the final event is a delete. cdc_patch_merge (fold half,
    # patch_merge the rest) must converge to the identical state, so it
    # shares this SQL verbatim.
    "cdc_patch_state": """
        WITH ev AS (
          SELECT user_id, event_id AS seq,
                 CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D' ELSE 'U' END AS op,
                 CASE WHEN event_id % 3 = 0 THEN NULL ELSE round(value, 4) END AS value,
                 CASE WHEN event_id % 5 = 0 THEN NULL ELSE epoch_ms(ts) END AS ts_ms
          FROM events
        ), agg AS (
          SELECT user_id,
                 max(seq) AS seq,
                 arg_max(op, seq) AS last_op,
                 max(seq) FILTER (WHERE op <> 'U') AS s_star,
                 max(CASE WHEN op = 'I' OR (op = 'U' AND value IS NOT NULL)
                          THEN {'s': seq, 'v': value} END) AS w_value,
                 max(CASE WHEN op = 'I' OR (op = 'U' AND ts_ms IS NOT NULL)
                          THEN {'s': seq, 'v': ts_ms} END) AS w_ts_ms
          FROM ev GROUP BY user_id
        )
        SELECT user_id, seq,
               CASE WHEN s_star IS NULL OR w_value.s >= s_star THEN w_value.v END AS value,
               CASE WHEN s_star IS NULL OR w_ts_ms.s >= s_star THEN w_ts_ms.v END AS ts_ms
        FROM agg WHERE last_op <> 'D'
    """,
    "cdc_delete_where": """
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE NOT COALESCE(lang = 'en' AND n_chars < 200, FALSE)
    """,
    "cdc_update_where": """
        SELECT doc_id, lang, source,
               CASE WHEN source = 'src7' THEN n_chars + 1000
                    ELSE n_chars END AS n_chars
        FROM documents
    """,
    "cdc_merge_into": """
        WITH src AS (
          SELECT doc_id, lang, source, n_chars FROM documents
          WHERE doc_id % 7 = 0
          UNION ALL
          SELECT doc_id + 10000000 AS doc_id, lang, source, n_chars
          FROM documents WHERE doc_id % 13 = 0
        )
        SELECT t.doc_id, t.lang, t.source,
               CASE WHEN s.doc_id IS NOT NULL
                         AND NOT COALESCE(t.source = 'src3', FALSE)
                    THEN s.n_chars * 2 ELSE t.n_chars END AS n_chars
        FROM documents t LEFT JOIN src s USING (doc_id)
        WHERE NOT COALESCE(s.doc_id IS NOT NULL AND t.source = 'src3', FALSE)
        UNION ALL
        SELECT s.doc_id, s.lang, s.source, s.n_chars
        FROM src s ANTI JOIN documents t USING (doc_id)
    """,
    "pii_scrub": """
        WITH d AS (
          SELECT doc_id,
                 text
                 || CASE WHEN doc_id % 10 = 0
                      THEN ' contact: user' || CAST(doc_id AS VARCHAR)
                           || '@example.com at 10.0.0.' || CAST(doc_id % 255 AS VARCHAR)
                      ELSE '' END
                 || CASE WHEN doc_id % 7 = 0
                      THEN ' call +1-555-01' || CAST(doc_id AS VARCHAR)
                      ELSE '' END AS text
          FROM documents
        )
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
                 '\\+\\d{1,3}[- ]?\\d{3,4}[- ]?\\d{3,6}', '<PHONE>', 'g') AS text,
               len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
               len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ip,
               len(regexp_extract_all(text, '\\+\\d{1,3}[- ]?\\d{3,4}[- ]?\\d{3,6}')) AS n_phone
        FROM d
    """,
    "text_repetition": """
        WITH g AS (
          SELECT doc_id,
                 list_transform(
                   generate_series(1, greatest(len(toks) - 2, 0)),
                   i -> array_to_string(list_slice(toks, i, i + 2), ' ')
                 ) AS grams
          FROM (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                               t -> t <> '') AS toks
            FROM documents
          )
        )
        SELECT doc_id,
               round(CASE WHEN len(grams) > 0
                 THEN (len(grams) - len(list_distinct(grams))) / CAST(len(grams) AS DOUBLE)
                 ELSE 0.0 END, 4) AS gram3_dup_frac,
               round(CASE WHEN len(grams) > 0 AND tc > 0
                 THEN (tc - dc) / tc ELSE 0.0 END, 4) AS gram3_dup_char_frac
        FROM (
          SELECT doc_id, grams,
                 CAST(list_sum(list_transform(grams, x -> length(x))) AS DOUBLE) AS tc,
                 CAST(list_sum(list_transform(list_distinct(grams), x -> length(x))) AS DOUBLE) AS dc
          FROM g
        )
    """,
    "pack_sequences": """
        WITH spans AS (
          SELECT source AS shard, doc_id, n_chars,
                 sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) AS e
          FROM documents WHERE n_chars > 0
        )
        SELECT shard, seq_id, doc_id,
               CAST(greatest(0, (e - n_chars) - seq_id * 1024) AS BIGINT) AS begin,
               CAST(least(1024, e - seq_id * 1024) AS BIGINT) AS "end"
        FROM (
          SELECT *, unnest(generate_series(
                   CAST(floor((e - n_chars) / 1024.0) AS BIGINT),
                   CAST(floor((e - 1) / 1024.0) AS BIGINT))) AS seq_id
          FROM spans
        )
    """,
    "decontamination": """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             t -> t <> '') AS toks
          FROM documents
        ),
        grams AS (
          SELECT doc_id,
                 unnest(list_transform(
                   generate_series(1, greatest(len(toks) - 3, 0)),
                   i -> array_to_string(list_slice(toks, i, i + 3), ' ')
                 )) AS shingle
          FROM toks
        ),
        doc_shingles AS (SELECT DISTINCT doc_id, shingle FROM grams),
        bench AS (SELECT DISTINCT shingle FROM doc_shingles WHERE doc_id % 50 = 0)
        SELECT doc_id, count(*) AS n_hits
        FROM doc_shingles JOIN bench USING (shingle)
        WHERE doc_id % 50 <> 0
        GROUP BY doc_id
    """,
    "bm25_topk": """
        WITH terms AS (
          SELECT doc_id, t AS term
          FROM documents, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS u(t)
          WHERE t <> ''
        ),
        dl AS (SELECT doc_id, count(*) AS dl FROM terms GROUP BY doc_id),
        stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        tf AS (
          SELECT doc_id, term, count(*) AS tf FROM terms
          WHERE term IN ('data', 'model', 'training')
          GROUP BY doc_id, term
        ),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
        SELECT doc_id, round(sum(
                 ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                 * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
               ), 4) AS score
        FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
        GROUP BY doc_id
        ORDER BY score DESC, doc_id
        LIMIT 15
    """,
    "sample_stratified": """
        SELECT doc_id, lang, source, n_chars FROM (
          SELECT *,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|7'), 1, 15))::BIGINT
                   % 1000000 AS u
          FROM documents
        )
        WHERE u < CASE lang WHEN 'en' THEN 500000 WHEN 'de' THEN 250000
                            WHEN 'fr' THEN 100000 ELSE 50000 END
    """,
    "tfidf_keywords": """
        WITH toks AS (
          SELECT doc_id, unnest(list_filter(str_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS term
          FROM documents
        ), tf AS (
          SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
        ), dfreq AS (
          SELECT term, count(*) AS df FROM tf GROUP BY 1
        ), n AS (
          SELECT count(*) AS n_docs FROM documents
        ), s AS (
          SELECT doc_id, term,
                 round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 4) AS score
          FROM tf JOIN dfreq USING (term) CROSS JOIN n
        ), r AS (
          SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rank
          FROM s
        )
        SELECT doc_id, term, score, CAST(rank AS INT) AS rank FROM r WHERE rank <= 3
    """,
    "bigram_logprob": f"""
        WITH toks AS (
          SELECT doc_id, {SQL_TOKENS.format(x='text')} AS toks FROM documents
        ), uni AS (
          SELECT tok, count(*) AS c
          FROM (SELECT unnest(toks) AS tok FROM toks) GROUP BY tok
        ), vocab AS (
          SELECT list(tok) AS vl
          FROM (SELECT tok FROM uni ORDER BY c DESC, tok LIMIT 500)
        ), mapped AS (
          SELECT doc_id,
                 list_transform(
                   toks,
                   t -> CASE WHEN list_contains(vl, t)
                             THEN t ELSE '<unk>' END) AS m
          FROM toks CROSS JOIN vocab
        ), bg AS (
          SELECT doc_id,
                 unnest(m[1:len(m) - 1]) AS w1,
                 unnest(m[2:len(m)]) AS w2
          FROM mapped WHERE len(m) >= 2
        ), bc AS (
          SELECT w1, w2, count(*) AS c_big FROM bg GROUP BY 1, 2
        ), oc AS (
          SELECT w1, sum(c_big) AS c_w1 FROM bc GROUP BY 1
        ), s AS (
          SELECT doc_id,
                 round(avg(-log2((c_big + 0.5) / (c_w1 + 0.5 * 501))), 4)
                   AS bits_per_bigram,
                 count(*) AS n_bigrams
          FROM bg JOIN bc USING (w1, w2) JOIN oc USING (w1)
          GROUP BY doc_id
        )
        SELECT d.doc_id, s.bits_per_bigram, s.n_bigrams
        FROM documents d LEFT JOIN s USING (doc_id)
    """,
    "select_token_budget": f"""
        WITH a AS (
          SELECT doc_id,
                 round(
                   least(CASE WHEN len({SQL_TOKENS.format(x='text')}) > 0 THEN len(regexp_extract_all(lower(text), '\\b(the|a|and|of|to|in|is|it|for|on)\\b'))::DOUBLE / len({SQL_TOKENS.format(x='text')}) ELSE 0 END * 2.5, 1.0) * 0.4
                   + least(len({SQL_TOKENS.format(x='text')}) / 64.0, 1.0) * 0.3
                   + CASE WHEN length(text) > 0 THEN length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / length(text) ELSE 0 END * 0.3
                 , 4) AS quality,
                 len({SQL_TOKENS.format(x='text')}) AS n_tokens
          FROM documents
        ), c AS (
          SELECT *, sum(n_tokens) OVER (ORDER BY quality DESC, doc_id) AS cum FROM a
        )
        SELECT doc_id, quality, n_tokens FROM c WHERE cum <= 10000
    """,
    "cap_sources": """
        WITH n AS (SELECT source, count(*) AS cnt FROM documents GROUP BY source),
        d AS (
          SELECT doc_id, lang, source, n_chars,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|13'), 1, 15))::BIGINT
                   % 1000000 AS u
          FROM documents
        )
        SELECT doc_id, lang, source, n_chars
        FROM d JOIN n USING (source)
        WHERE u < least(1000000, (15 * 1000000) // cnt)
    """,
    "corpus_mixture": """
        WITH drawn AS (
          SELECT doc_id, lang, source, n_chars,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|11'), 1, 15))::BIGINT
                   % 1000000 AS u
          FROM documents
        ), copies AS (
          SELECT doc_id, lang, source, n_chars,
                 CASE lang WHEN 'en' THEN 1 WHEN 'de' THEN 2 ELSE 0 END
                 + CASE WHEN u < (CASE lang WHEN 'en' THEN 500000
                                            WHEN 'fr' THEN 250000
                                            ELSE 0 END)
                        THEN 1 ELSE 0 END AS n_copies
          FROM drawn
        )
        SELECT doc_id, lang, source, n_chars,
               CAST(unnest(generate_series(0, n_copies - 1)) AS BIGINT) AS epoch
        FROM copies WHERE n_copies > 0
    """,
    "cdc_compact": """
        SELECT user_id, seq, op, value FROM (
          SELECT user_id, event_id AS seq,
                 CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D' ELSE 'U' END AS op,
                 round(value, 4) AS value,
                 row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
          FROM events
        ) WHERE rn = 1 AND op <> 'D'
    """,
    "cdc_incremental_read": """
        WITH latest AS (
          SELECT user_id, seq, op, value FROM (
            SELECT user_id, event_id AS seq,
                   CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D' ELSE 'U' END AS op,
                   round(value, 4) AS value,
                   row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
            FROM events
          ) WHERE rn = 1 AND op <> 'D'
        )
        SELECT user_id, seq, op, value FROM latest
        WHERE seq > (SELECT (min(event_id) + max(event_id)) // 2 FROM events)
    """,
    "cdc_snapshot_diff": """
        WITH ev AS (
          SELECT user_id, event_id AS seq,
                 CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D' ELSE 'U' END AS op,
                 round(value, 4) AS value
          FROM events
        ),
        mid AS (SELECT CAST(floor((min(seq) + max(seq)) / 2.0) AS BIGINT) AS m FROM ev),
        s1 AS (
          SELECT user_id, seq, op, value FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY seq DESC) rn
            FROM ev WHERE seq <= (SELECT m FROM mid)
          ) WHERE rn = 1 AND op <> 'D'
        ),
        s2 AS (
          SELECT user_id, seq, op, value FROM (
            SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY seq DESC) rn
            FROM ev
          ) WHERE rn = 1 AND op <> 'D'
        )
        SELECT change_type, user_id, seq, op, value FROM (
          SELECT CASE
                   WHEN s1.user_id IS NULL THEN 'insert'
                   WHEN s2.user_id IS NULL THEN 'delete'
                   WHEN s1.seq <> s2.seq OR s1.op <> s2.op
                        OR (s1.value IS DISTINCT FROM s2.value) THEN 'update'
                 END AS change_type,
                 COALESCE(s2.user_id, s1.user_id) AS user_id,
                 CASE WHEN s2.user_id IS NOT NULL THEN s2.seq ELSE s1.seq END AS seq,
                 CASE WHEN s2.user_id IS NOT NULL THEN s2.op ELSE s1.op END AS op,
                 CASE WHEN s2.user_id IS NOT NULL THEN s2.value ELSE s1.value END AS value
          FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id
        ) WHERE change_type IS NOT NULL
    """,
    "cdc_sessionize": """
        WITH marked AS (
          SELECT user_id,
                 CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)) > 1800000
                      OR lag(ts) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
        )
        SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions, count(*) AS n_events
        FROM marked GROUP BY user_id
    """,
    "cdc_asof_join": """
        WITH s AS (
          SELECT user_id, epoch_ms(ts) AS ts_ms, max(round(value, 4)) AS state_value
          FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        ),
        p AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ts_ms
          FROM events WHERE event_type = 'click'
        )
        SELECT p.user_id, p.event_id, p.ts_ms,
               CASE WHEN p.ts_ms - s.ts_ms <= 604800000 THEN s.ts_ms END AS r_ts_ms,
               CASE WHEN p.ts_ms - s.ts_ms <= 604800000 THEN s.state_value END AS r_state_value
        FROM p ASOF LEFT JOIN s
          ON p.user_id = s.user_id AND p.ts_ms >= s.ts_ms
    """,
    "cdc_scd2": """
        WITH log AS (
          SELECT user_id, event_id AS seq,
                 CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D' ELSE 'U' END AS op,
                 round(value, 4) AS value
          FROM events
        ),
        closed AS (
          SELECT *, lead(seq) OVER (PARTITION BY user_id ORDER BY seq) AS valid_to_seq
          FROM log
        )
        SELECT user_id, value, seq AS valid_from_seq, valid_to_seq,
               valid_to_seq IS NULL AS is_current
        FROM closed WHERE op <> 'D'
    """,
    "cdc_row_lineage": """
        WITH log AS (
          SELECT user_id, event_id AS seq,
                 CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D' ELSE 'U' END AS op
          FROM events
        ),
        marked AS (
          SELECT *, max(CASE WHEN op = 'D' THEN seq END)
                      OVER (PARTITION BY user_id) AS max_del
          FROM log
        ),
        live AS (
          SELECT * FROM marked
          WHERE op <> 'D' AND (max_del IS NULL OR seq > max_del)
        )
        SELECT user_id,
               min(seq) AS created_seq,
               max(seq) AS last_updated_seq,
               count(DISTINCT seq) AS n_versions,
               md5(concat_ws(chr(31), CAST(user_id AS VARCHAR),
                             CAST(min(seq) AS VARCHAR))) AS row_id
        FROM live GROUP BY user_id
    """,
    "time_rollup": """
        WITH b AS (
          SELECT strftime(ts, '%Y-%m-%d') AS d,
                 CAST(extract(hour FROM ts) AS INTEGER) AS h,
                 value
          FROM events
        )
        SELECT d, h, CAST(grouping(d, h) AS INTEGER) AS lvl,
               count(*) AS n_events, round(sum(value), 2) AS sum_value
        FROM b GROUP BY ROLLUP(d, h)
    """,
    "cdc_metrics": """
        SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value,
               count(DISTINCT user_id) AS n_users,
               min(epoch_ms(ts)) AS first_ms, max(epoch_ms(ts)) AS last_ms
        FROM events GROUP BY event_type
    """,
    "text_analysis": f"""
        WITH base AS (
          SELECT doc_id, text, {SQL_TOKENS.format(x='text')} AS toks FROM documents
        )
        SELECT doc_id,
               len(toks) AS n_tokens,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_subtokens,
               CASE
                 WHEN greatest(
                   len(regexp_extract_all(lower(text), '\\b(the|and|of|to|a)\\b')),
                   len(regexp_extract_all(lower(text), '\\b(der|die|und|das|ist)\\b')),
                   len(regexp_extract_all(lower(text), '\\b(el|la|los|y|de)\\b')),
                   len(regexp_extract_all(lower(text), '\\b(le|la|et|les|des)\\b'))) = 0 THEN 'und'
                 WHEN len(regexp_extract_all(lower(text), '\\b(der|die|und|das|ist)\\b')) = greatest(
                   len(regexp_extract_all(lower(text), '\\b(the|and|of|to|a)\\b')),
                   len(regexp_extract_all(lower(text), '\\b(der|die|und|das|ist)\\b')),
                   len(regexp_extract_all(lower(text), '\\b(el|la|los|y|de)\\b')),
                   len(regexp_extract_all(lower(text), '\\b(le|la|et|les|des)\\b'))) THEN 'de'
                 WHEN len(regexp_extract_all(lower(text), '\\b(the|and|of|to|a)\\b')) = greatest(
                   len(regexp_extract_all(lower(text), '\\b(the|and|of|to|a)\\b')),
                   len(regexp_extract_all(lower(text), '\\b(der|die|und|das|ist)\\b')),
                   len(regexp_extract_all(lower(text), '\\b(el|la|los|y|de)\\b')),
                   len(regexp_extract_all(lower(text), '\\b(le|la|et|les|des)\\b'))) THEN 'en'
                 WHEN len(regexp_extract_all(lower(text), '\\b(el|la|los|y|de)\\b')) = greatest(
                   len(regexp_extract_all(lower(text), '\\b(the|and|of|to|a)\\b')),
                   len(regexp_extract_all(lower(text), '\\b(der|die|und|das|ist)\\b')),
                   len(regexp_extract_all(lower(text), '\\b(el|la|los|y|de)\\b')),
                   len(regexp_extract_all(lower(text), '\\b(le|la|et|les|des)\\b'))) THEN 'es'
                 ELSE 'fr'
               END AS pred_lang,
               round(
                 least(CASE WHEN len(toks) > 0 THEN len(regexp_extract_all(lower(text), '\\b(the|a|and|of|to|in|is|it|for|on)\\b'))::DOUBLE / len(toks) ELSE 0 END * 2.5, 1.0) * 0.4
                 + least(len(toks) / 64.0, 1.0) * 0.3
                 + CASE WHEN length(text) > 0 THEN length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / length(text) ELSE 0 END * 0.3
               , 4) AS quality,
               md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fingerprint
        FROM base
    """,
    "dedup_exact": f"""
        WITH fp AS (
          SELECT doc_id,
                 md5(array_to_string(list_sort(list_distinct({SQL_TOKENS.format(x='text')})), ' ')) AS fingerprint
          FROM documents
        )
        SELECT md5(fingerprint) AS content_hash, min(doc_id) AS keeper_id, count(*) AS n_copies
        FROM fp GROUP BY 1
    """,
    # Same min-wise family as ops/dedup.minhash_signature: one md5 per
    # shingle -> 32-bit base hash x -> K affine perms (a_i*x + b_i) mod p,
    # coefficients imported from minhash_coeffs so both engines embed
    # identical literals.
    "dedup_minhash_lsh": f"""
        WITH toks AS (
          SELECT doc_id, list_filter(str_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
          FROM documents
        ),
        sh AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform(generate_series(1, len(toks) - 2),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS sh
          FROM toks WHERE len(toks) >= 3
        ),
        xs AS (
          SELECT doc_id, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS x FROM sh
        ),
        sig AS (
          SELECT doc_id,
                 {", ".join(f"min((x * {a} + {b}) % {dedup._MH_PRIME}) AS mh{i}" for i, (a, b) in enumerate(dedup.minhash_coeffs(8)))}
          FROM xs GROUP BY doc_id
        ),
        banded AS (
          {" UNION ALL ".join(f"SELECT doc_id, {band} AS band, md5(CAST(mh{2 * band} AS VARCHAR) || '|' || CAST(mh{2 * band + 1} AS VARCHAR)) AS bh FROM sig" for band in range(4))}
        )
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    """,
    "dedup_ngram_jaccard": """
        WITH toks AS (
          SELECT doc_id, list_filter(str_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
          FROM documents
        ),
        sh AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform(generate_series(1, len(toks) - 2),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS sh
          FROM toks WHERE len(toks) >= 3
        ),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        common AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id_a, id_b,
               round(common::DOUBLE / (sa.sz + sb.sz - common), 4) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE round(common::DOUBLE / (sa.sz + sb.sz - common), 4) >= 0.2
    """,
    "dedup_span_metrics": """
        WITH toks AS (
          SELECT doc_id, list_filter(str_split_regex(lower(text), '\\s+'), t -> t <> '') AS toks
          FROM documents
        ),
        base AS (SELECT doc_id, len(toks) AS n_tokens FROM toks),
        pg AS (
          SELECT doc_id, unnest(generate_series(1, len(toks) - 2)) AS pos, toks
          FROM toks WHERE len(toks) >= 3
        ),
        grams AS (
          SELECT doc_id, pos, toks[pos] || ' ' || toks[pos+1] || ' ' || toks[pos+2] AS g
          FROM pg
        ),
        hot AS (SELECT g FROM grams GROUP BY g HAVING count(*) > 2),
        cov AS (
          SELECT doc_id, unnest(generate_series(pos, pos + 2)) AS cpos
          FROM grams WHERE g IN (SELECT g FROM hot)
        ),
        covc AS (SELECT doc_id, count(DISTINCT cpos) AS dup FROM cov GROUP BY doc_id)
        SELECT b.doc_id, b.n_tokens,
               coalesce(c.dup, 0)::BIGINT AS dup_tokens,
               CASE WHEN b.n_tokens > 0
                    THEN round(coalesce(c.dup, 0)::DOUBLE / b.n_tokens, 4)
                    ELSE 0.0 END AS dup_frac
        FROM base b LEFT JOIN covc c USING (doc_id)
    """,
    "dedup_mapping": """
        SELECT doc_id,
               min(doc_id) OVER (PARTITION BY md5(text)) AS keeper_id,
               doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_duplicate
        FROM documents
    """,
    "dedup_simhash": f"""
        WITH base AS (
          SELECT doc_id, list_distinct({SQL_TOKENS.format(x='text')}) AS toks FROM documents
        ),
        bits AS (
          SELECT doc_id,
       {_SIMHASH_BIT_SUMS}
          FROM base
        )
        SELECT doc_id, ({_SIMHASH_SUM})::BIGINT AS simhash,
               (({_SIMHASH_SUM})::BIGINT // {2**(_SIMHASH_BITS - 8)})::BIGINT AS bucket
        FROM bits
    """,
    # banded Hamming-LSH pairs: 4 bands x 15 bits; band j value =
    # (sig >> 15j) & 32767 (top band keeps the remainder — none at 60/4)
    "dedup_simhash_pairs": f"""
        WITH base AS (
          SELECT doc_id, list_distinct({SQL_TOKENS.format(x='text')}) AS toks FROM documents
        ),
        bits AS (
          SELECT doc_id,
       {_SIMHASH_BIT_SUMS}
          FROM base
        ),
        sig AS (SELECT doc_id, ({_SIMHASH_SUM})::BIGINT AS simhash FROM bits),
        banded AS (
          SELECT doc_id, 0 AS band, (simhash % {2**15})::BIGINT AS bv FROM sig
          UNION ALL SELECT doc_id, 1, ((simhash // {2**15}) % {2**15})::BIGINT FROM sig
          UNION ALL SELECT doc_id, 2, ((simhash // {2**30}) % {2**15})::BIGINT FROM sig
          UNION ALL SELECT doc_id, 3, (simhash // {2**45})::BIGINT FROM sig
        )
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
    """,
    "ann_cosine_topk": """
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
        c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
        scored AS (
          SELECT query_id, neighbor_id,
                 round(list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))), 4) AS cosine
          FROM c CROSS JOIN q WHERE neighbor_id <> query_id
        )
        SELECT query_id, neighbor_id, cosine, rank FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM scored
        ) WHERE rank <= 3
    """,
    "ann_ivf_topk": """
        WITH cent AS (
          SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cv FROM embeddings ORDER BY vec_id LIMIT 4
        ),
        assigned AS (
          SELECT vec_id, embedding, centroid_id FROM (
            SELECT e.vec_id, e.embedding, c.centroid_id,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_dot_product(e.embedding::DOUBLE[], c.cv) / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                              c.centroid_id ASC
                   ) AS r
            FROM embeddings e CROSS JOIN cent c
          ) WHERE r = 1
        ),
        q AS (
          SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv, centroid_id
          FROM assigned WHERE vec_id >= 5 AND vec_id < 10
        ),
        scored AS (
          SELECT q.query_id, a.vec_id AS neighbor_id,
                 round(list_dot_product(q.qv, a.embedding::DOUBLE[]) / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))), 4) AS cosine
          FROM assigned a JOIN q ON a.centroid_id = q.centroid_id
          WHERE a.vec_id <> q.query_id
        )
        SELECT query_id, neighbor_id, cosine, rank FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
          FROM scored
        ) WHERE rank <= 3
    """,
    "embedding_neardup": """
        WITH cent AS (
          SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cv FROM embeddings ORDER BY vec_id LIMIT 8
        ),
        assigned AS (
          SELECT vec_id, embedding, centroid_id FROM (
            SELECT e.vec_id, e.embedding, c.centroid_id,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_dot_product(e.embedding::DOUBLE[], c.cv) / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                              c.centroid_id ASC
                   ) AS r
            FROM embeddings e CROSS JOIN cent c
          ) WHERE r = 1
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) AS cosine
        FROM assigned a JOIN assigned b ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
        WHERE round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) >= 0.35
    """,
    "semantic_dedup": """
        WITH cent AS (
          SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cv FROM embeddings ORDER BY vec_id LIMIT 8
        ),
        assigned AS (
          SELECT vec_id, embedding, centroid_id FROM (
            SELECT e.vec_id, e.embedding, c.centroid_id,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_dot_product(e.embedding::DOUBLE[], c.cv) / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                              c.centroid_id ASC
                   ) AS r
            FROM embeddings e CROSS JOIN cent c
          ) WHERE r = 1
        ),
        pairs AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM assigned a JOIN assigned b ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
          WHERE round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) >= 0.35
        ),
        keepers AS (
          SELECT id_b, min(id_a) AS keeper FROM pairs GROUP BY id_b
        )
        SELECT e.vec_id, coalesce(k.keeper, e.vec_id) AS keeper_id,
               k.keeper IS NULL AS kept
        FROM embeddings e LEFT JOIN keepers k ON e.vec_id = k.id_b
    """,
    "multimodal_meta": """
        SELECT doc_id AS media_id, 'blob' AS kind,
               octet_length(encode(text)) AS byte_len,
               sha256(text) AS sha256
        FROM documents
    """,
    "boilerplate_removal": """
        WITH s AS (
          SELECT doc_id,
                 'shared header line' || chr(10)
                 || regexp_replace(text, ' a ', chr(10), 'g')
                 || chr(10) || 'shared footer line' AS text
          FROM documents
        ),
        lns AS (
          SELECT doc_id,
                 list_filter(list_transform(string_split(text, chr(10)),
                             x -> trim(x)), x -> x <> '') AS lines
          FROM s
        ),
        l AS (
          SELECT doc_id, unnest(lines) AS line,
                 generate_subscripts(lines, 1) AS pos
          FROM lns
        ),
        hot AS (
          SELECT line FROM (
            SELECT line, count(DISTINCT doc_id) AS df FROM l GROUP BY line
          ) WHERE df > 100
        )
        SELECT doc_id,
               array_to_string(list(line ORDER BY pos), chr(10)) AS text,
               CAST(count(*) AS INT) AS n_lines_kept
        FROM l ANTI JOIN hot USING (line)
        GROUP BY doc_id
    """,
    "chunk_documents": """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(str_split_regex(text, '\\s+'), t -> t <> '') AS t
          FROM documents
        ),
        starts AS (
          SELECT doc_id, t,
                 unnest(generate_series(0, len(t) - 1, 24)) AS s,
                 generate_subscripts(generate_series(0, len(t) - 1, 24), 1) - 1 AS chunk_id
          FROM toks WHERE len(t) > 0
        )
        SELECT doc_id,
               CAST(chunk_id AS INT) AS chunk_id,
               CAST(len(list_slice(t, s + 1, s + 32)) AS INT) AS chunk_n_tokens,
               array_to_string(list_slice(t, s + 1, s + 32), ' ') AS chunk_text
        FROM starts
    """,
    "repeated_spans": f"""
        WITH src AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 4 = 0
                      THEN '{_LICENSE_HEADER} ' || text ELSE text END AS text
          FROM documents
        ),
        toks AS (
          SELECT doc_id,
                 list_filter(str_split_regex(text, '\\s+'), t -> t <> '') AS t
          FROM src
        ),
        wins AS (
          SELECT doc_id, unnest(generate_series(0, len(t) - 8, 4)) AS win_start, t
          FROM toks WHERE len(t) >= 8
        ),
        hashed AS (
          SELECT doc_id, win_start,
                 md5(array_to_string(list_slice(t, win_start + 1, win_start + 8), ' ')) AS win_hash
          FROM wins
        ),
        hot AS (
          SELECT win_hash FROM hashed
          GROUP BY win_hash HAVING count(DISTINCT doc_id) >= 2
        ),
        rep AS (
          SELECT DISTINCT h.doc_id, h.win_start
          FROM hashed h JOIN hot USING (win_hash)
        ),
        marked AS (
          SELECT doc_id, win_start,
                 max(win_start + 8) OVER (
                   PARTITION BY doc_id ORDER BY win_start
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ) AS prev_max_end
          FROM rep
        ),
        islands AS (
          SELECT doc_id, win_start,
                 sum(CASE WHEN prev_max_end IS NULL OR win_start > prev_max_end
                          THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY win_start) AS island
          FROM marked
        )
        SELECT doc_id,
               CAST(min(win_start) AS INT) AS span_start,
               CAST(max(win_start) + 8 AS INT) AS span_end
        FROM islands GROUP BY doc_id, island
    """,
    "stratum_stats": """
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               round(avg(n_chars), 4) AS mean_chars,
               round(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
               round(quantile_cont(n_chars, 0.9), 4) AS p90_chars,
               CAST(min(n_chars) AS BIGINT) AS min_chars,
               CAST(max(n_chars) AS BIGINT) AS max_chars
        FROM documents
        GROUP BY lang
    """,
    "web_quality": """
        WITH s AS (
          SELECT doc_id,
                 '- item one' || chr(10)
                 || regexp_replace(text, ' a ', '.' || chr(10), 'g')
                 || CASE WHEN doc_id % 5 = 0
                         THEN chr(10) || 'to be continued...' ELSE '.' END
                 || CASE WHEN doc_id % 7 = 0
                         THEN chr(10) || '# tag {x}' ELSE '' END AS t
          FROM documents
        ),
        base AS (
          SELECT doc_id, t,
                 list_filter(list_transform(string_split(t, chr(10)),
                             x -> trim(x)), x -> x <> '') AS lines,
                 list_filter(str_split_regex(lower(t), '\\s+'),
                             x -> x <> '') AS toks
          FROM s
        )
        SELECT doc_id,
          round(CASE WHEN len(lines) > 0 THEN len(list_filter(lines, x -> regexp_matches(x, '[.!?"]$'))) / CAST(len(lines) AS DOUBLE) ELSE 0.0 END, 4) AS terminal_punct_line_frac,
          round(CASE WHEN len(lines) > 0 THEN len(list_filter(lines, x -> regexp_matches(x, '^([-*]|•)'))) / CAST(len(lines) AS DOUBLE) ELSE 0.0 END, 4) AS bullet_line_frac,
          round(CASE WHEN len(lines) > 0 THEN len(list_filter(lines, x -> regexp_matches(x, '(\\.\\.\\.|…)$'))) / CAST(len(lines) AS DOUBLE) ELSE 0.0 END, 4) AS ellipsis_line_frac,
          round(CASE WHEN len(toks) > 0 THEN list_sum(list_transform(toks, x -> CAST(length(x) AS DOUBLE))) / len(toks) ELSE 0.0 END, 4) AS mean_word_length,
          round(CASE WHEN len(toks) > 0 THEN ((length(t) - length(replace(t, '#', ''))) + len(regexp_extract_all(t, '(\\.\\.\\.|…)'))) / CAST(len(toks) AS DOUBLE) ELSE 0.0 END, 4) AS symbol_word_ratio,
          round(CASE WHEN len(toks) > 0 THEN len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) / CAST(len(toks) AS DOUBLE) ELSE 0.0 END, 4) AS alpha_word_frac,
          contains(lower(t), 'lorem ipsum') AS has_lorem_ipsum,
          contains(t, '{') AS has_curly_brace
        FROM base
    """,
    "clean_lines": """
        WITH s AS (
          SELECT doc_id,
                 '- item one' || chr(10)
                 || regexp_replace(text, ' a ', '.' || chr(10), 'g') || '.'
                 || CASE WHEN doc_id % 5 = 0
                         THEN chr(10) || 'please enable javascript to view this page.'
                         ELSE '' END
                 || CASE WHEN doc_id % 7 = 0
                         THEN chr(10) || 'to be continued.' ELSE '' END AS t
          FROM documents
        ),
        base AS (
          SELECT doc_id,
                 list_filter(list_transform(string_split(t, chr(10)),
                             x -> trim(x)), x -> x <> '') AS lines
          FROM s
        ),
        k AS (
          SELECT doc_id, lines,
                 list_filter(lines, x ->
                   len(list_filter(str_split_regex(x, '\\s+'), w -> w <> '')) >= 5
                   AND regexp_matches(x, '[.!?"]$')
                   AND NOT contains(lower(x), 'javascript')) AS kept
          FROM base
        )
        SELECT doc_id,
               array_to_string(kept, chr(10)) AS clean_text,
               CAST(len(kept) AS INT) AS n_lines_kept,
               CAST(len(lines) AS INT) AS n_lines_total
        FROM k
    """,
    "token_entropy": """
        WITH t AS (
          SELECT doc_id,
                 list_sort(list_filter(str_split_regex(lower(text), '\\s+'),
                           x -> x <> '')) AS toks
          FROM documents
        ),
        r AS (
          SELECT doc_id, len(toks) AS n,
                 list_filter(generate_series(1, len(toks)),
                             i -> i = len(toks) OR toks[i] <> toks[i + 1]) AS ends
          FROM t
        )
        SELECT doc_id,
               round(CASE WHEN n > 0 THEN -list_sum(list_transform(
                 list_transform(ends, (e, j) -> e - CASE WHEN j = 1 THEN 0
                                                        ELSE ends[j - 1] END),
                 l -> (CAST(l AS DOUBLE) / n) * log2(CAST(l AS DOUBLE) / n)))
               ELSE 0.0 END, 4) AS entropy_bits
        FROM r
    """,
    "multimodal_headers": """
        SELECT doc_id AS media_id,
               CAST(doc_id % 192 + 1 AS BIGINT) AS width,
               CAST(doc_id % 96 + 1 AS BIGINT) AS height,
               CAST(1 AS BIGINT) AS n_frames
        FROM documents
    """,
    "multimodal_av_headers": """
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 2 = 0 THEN 'audio' ELSE 'video' END AS kind,
               CASE WHEN doc_id % 2 = 1 THEN CAST(doc_id % 640 + 16 AS BIGINT) END AS width,
               CASE WHEN doc_id % 2 = 1 THEN CAST(doc_id % 360 + 16 AS BIGINT) END AS height,
               CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 100 + 1
                         ELSE doc_id % 300 + 1 END AS BIGINT) AS n_frames,
               CASE WHEN doc_id % 2 = 0 THEN CAST(8000 * (doc_id % 6 + 1) AS BIGINT) END AS sample_rate
        FROM documents
    """,
    "multimodal_decode": """
        WITH m AS (
          SELECT doc_id AS media_id,
                 CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                 octet_length(encode(text)) AS byte_len,
                 sha256(text) AS h
          FROM documents
        )
        SELECT media_id, kind, byte_len,
               CASE kind WHEN 'image' THEN 64 + ('0x' || substr(h, 1, 2))::INT % 192 WHEN 'video' THEN 320 END AS width,
               CASE kind WHEN 'image' THEN 64 + ('0x' || substr(h, 3, 2))::INT % 192 WHEN 'video' THEN 240 END AS height,
               CASE kind WHEN 'image' THEN 1 WHEN 'video' THEN 1 + ('0x' || substr(h, 7, 2))::INT % 300 END AS n_frames,
               CASE kind WHEN 'audio' THEN 8000 * (1 + ('0x' || substr(h, 5, 2))::INT % 6) END AS sample_rate
        FROM m
    """,
    "dedup_cross": f"""
        WITH fp AS (
          SELECT doc_id,
                 md5(md5(array_to_string(list_sort(list_distinct({SQL_TOKENS.format(x='text')})), ' '))) AS content_hash
          FROM documents
        ),
        incoming AS (SELECT * FROM fp WHERE doc_id % 3 = 0),
        existing AS (SELECT DISTINCT content_hash FROM fp WHERE doc_id % 3 <> 0)
        SELECT min(i.doc_id) AS doc_id, i.content_hash, count(*) AS batch_copies
        FROM incoming i ANTI JOIN existing e ON i.content_hash = e.content_hash
        GROUP BY i.content_hash
    """,
    "dedup_paragraphs": """
        WITH s AS (
          SELECT doc_id,
                 str_split(regexp_replace(text, ' a ', chr(10), 'g'), chr(10)) AS arr
          FROM documents
        ),
        px AS (
          SELECT doc_id, len(arr) AS n_paras,
                 unnest(list_transform(arr, (x, i) -> {'idx': i - 1, 'para': x})) AS p
          FROM s
        ),
        ranked AS (
          SELECT doc_id, n_paras, p.idx AS idx, p.para AS para,
                 row_number() OVER (PARTITION BY md5(p.para) ORDER BY doc_id, p.idx) AS rn
          FROM px
        )
        SELECT doc_id,
               string_agg(para, chr(10) ORDER BY idx) AS text,
               max(n_paras)::BIGINT AS n_paras,
               count(*) AS n_kept
        FROM ranked WHERE rn = 1
        GROUP BY doc_id
    """,
    "vocab_topk": f"""
        WITH toks AS (
          SELECT doc_id, unnest({SQL_TOKENS.format(x='text')}) AS token
          FROM documents
        ),
        per_doc AS (SELECT token, doc_id, count(*) AS tf FROM toks GROUP BY 1, 2)
        SELECT token, sum(tf)::BIGINT AS tf, count(*) AS df
        FROM per_doc GROUP BY token
        ORDER BY tf DESC, df DESC, token ASC
        LIMIT 30
    """,
    "shard_assignment": """
        WITH u AS (
          SELECT doc_id,
                 ('0x' || substr(md5(doc_id::VARCHAR || '|7'), 1, 15))::BIGINT % 1000000 AS u
          FROM documents
        )
        SELECT doc_id,
               (u % 8)::INTEGER AS shard,
               (row_number() OVER (PARTITION BY u % 8 ORDER BY u, doc_id) - 1)::BIGINT AS pos
        FROM u
    """,
    "embedding_decontam": """
        WITH cent AS (
          SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cv FROM embeddings ORDER BY vec_id LIMIT 8
        ),
        assigned AS (
          SELECT vec_id, embedding, centroid_id FROM (
            SELECT e.vec_id, e.embedding, c.centroid_id,
                   row_number() OVER (
                     PARTITION BY e.vec_id
                     ORDER BY list_dot_product(e.embedding::DOUBLE[], c.cv) / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
                              c.centroid_id ASC
                   ) AS r
            FROM embeddings e CROSS JOIN cent c
          ) WHERE r = 1
        )
        SELECT c.vec_id, count(*) AS n_hits,
               max(round(list_dot_product(c.embedding::DOUBLE[], b.embedding::DOUBLE[]) / (sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])) * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4)) AS max_cosine
        FROM assigned c JOIN assigned b ON c.centroid_id = b.centroid_id
        WHERE c.vec_id % 10 <> 0 AND b.vec_id % 10 = 0
          AND round(list_dot_product(c.embedding::DOUBLE[], b.embedding::DOUBLE[]) / (sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[])) * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) >= 0.35
        GROUP BY c.vec_id
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
}

# Transitive closure of the MinHash-LSH pairs via recursive CTE — the
# oracle twin of the ITERATIVE Spark connected-components operator
# (ops/dedup.duplicate_groups). Built on the dedup_minhash_lsh oracle text
# so both sides consume the identical pair list.
ORACLES["dedup_groups"] = f"""
    WITH RECURSIVE pairs AS ({ORACLES["dedup_minhash_lsh"]}),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(src, dst) AS (
      SELECT a, b FROM edges
      UNION
      SELECT reach.src, e.b FROM reach JOIN edges e ON reach.dst = e.a
    )
    SELECT src AS doc_id, least(src, min(dst)) AS group_id
    FROM reach GROUP BY src
"""

# star_groups computes the identical fixpoint by a different algorithm;
# the oracle is the same transitive closure.
ORACLES["dedup_groups_star"] = ORACLES["dedup_groups"]
# merge-on-read must converge to the exact same final state as the COW
# merge — one oracle, two physical strategies under test
ORACLES["cdc_mor_state"] = ORACLES["cdc_merge_upsert"]

# --- URL canonicalization (ops/web.py) ---------------------------------
# The oracle builds the byte-identical synthetic raw URL (see
# _synthetic_url_expr) and re-implements the documented canonical form with
# DuckDB string/list functions; suffix + tracking-param sets are imported
# from ops.web so both engines share one source of truth.
from table2qb_spark.ops.web import (  # noqa: E402
    MULTI_LABEL_SUFFIXES,
    TRACKING_PARAM_NAMES,
)

_ML_SQL = ", ".join(f"'{s}'" for s in MULTI_LABEL_SUFFIXES)
_TP_SQL = ", ".join(f"'{s}'" for s in TRACKING_PARAM_NAMES)

ORACLES["url_canonical"] = f"""
    WITH hosts AS (
      SELECT doc_id,
             (CASE WHEN (doc_id % 50) % 2 = 0 THEN 'cdn.' ELSE '' END)
             || 'site-' || (doc_id % 50) || '.'
             || (['com','co.uk','org','com.au'])[((doc_id % 50) % 4)::INT + 1]
               AS hc
      FROM documents
    ),
    raw AS (
      SELECT doc_id,
        (CASE WHEN (doc_id % 50) % 3 = 0
              THEN CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'http' END
              ELSE CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END END)
        || '://'
        || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
        || (CASE WHEN doc_id % 4 = 0 THEN upper(hc) ELSE hc END)
        || (CASE WHEN (doc_id % 50) % 7 = 0 THEN ':8080'
                 WHEN doc_id % 5 = 0 THEN
                   CASE WHEN (doc_id % 50) % 3 = 0 THEN ':80' ELSE ':443' END
                 ELSE '' END)
        || '/docs/' || (doc_id % 50)
        || (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END)
        || (CASE WHEN (doc_id % 50) % 5 = 0
              THEN CASE WHEN doc_id % 2 = 1 THEN '?utm_source=x' ELSE '' END
              ELSE (['?b=2&utm_source=feed&a=1','?a=1&b=2&gclid=xyz',
                     '?b=2&a=1'])[(doc_id % 3)::INT + 1] END)
        || (CASE WHEN doc_id % 2 = 1 THEN '#s' || (doc_id % 3) ELSE '' END)
          AS url
      FROM hosts
    ),
    parts AS (
      SELECT doc_id, url,
        lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
          AS scheme,
        regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)
          AS auth,
        regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)
          AS path,
        CASE WHEN contains(url, '?')
             THEN regexp_extract(url, '\\?([^#]*)', 1) ELSE '' END AS query
      FROM raw
    ),
    norm AS (
      SELECT doc_id, url, scheme,
        regexp_replace(lower(regexp_replace(auth, ':[0-9]+$', '')),
                       '^www\\.', '') AS host,
        regexp_extract(auth, ':([0-9]+)$', 1) AS port,
        regexp_replace(path, '/+$', '') AS path_n,
        array_to_string(list_sort(list_filter(string_split(query, '&'),
          p -> p <> '' AND NOT starts_with(p, 'utm_')
               AND NOT string_split(p, '=')[1] IN ({_TP_SQL}))), '&') AS qs
      FROM parts
    )
    SELECT doc_id, url,
      scheme || '://' || host
      || CASE WHEN port <> '' AND port <>
                (CASE scheme WHEN 'https' THEN '443'
                             WHEN 'http' THEN '80' ELSE '' END)
              THEN ':' || port ELSE '' END
      || path_n
      || CASE WHEN qs <> '' THEN '?' || qs ELSE '' END AS url_norm,
      CASE WHEN len(labels) >= 3
                AND (labels[-2] || '.' || labels[-1]) IN ({_ML_SQL})
           THEN labels[-3] || '.' || labels[-2] || '.' || labels[-1]
           WHEN len(labels) >= 2 THEN labels[-2] || '.' || labels[-1]
           ELSE host END AS domain
    FROM (SELECT *, string_split(host, '.') AS labels FROM norm)
"""

ORACLES["quality_classifier"] = """
    SELECT doc_id,
      round(1.0 / (1.0 + exp(-(
        -0.0625 + coalesce(list_sum(list_transform(
            list_filter(string_split(lower(text), ' '), t -> t <> ''),
            t -> CASE t WHEN 'fast' THEN 0.75 WHEN 'slow' THEN -0.625
                        WHEN 'merge' THEN 0.5 WHEN 'hash' THEN -0.25
                        WHEN 'spark' THEN 0.125 ELSE 0.0 END)), 0.0)
      ))), 6) AS quality_prob
    FROM documents
"""

# Half-fold + patch_merge must converge to the one-shot fold's exact state,
# and so must the two-batch lake replay through merge_patch.
ORACLES["cdc_patch_merge"] = ORACLES["cdc_patch_state"]
ORACLES["cdc_patch_lake"] = ORACLES["cdc_patch_state"]

ORACLES["url_dedup"] = f"""
    WITH canon AS ({ORACLES["url_canonical"]})
    SELECT url_norm, MIN(doc_id) AS keeper, COUNT(*) AS n_copies
    FROM canon GROUP BY url_norm
"""

# End-to-end prep composite: one CTE chain mirroring prepare_training_data's
# fused plan stage by stage — exact dedup (md5(text) keeper), benchmark
# 4-gram decontamination (%50 slice; benchmark docs themselves stay), token/
# quality annotation, gates, deterministic stratified sample (seed 7),
# 512-token sequence packing.
ORACLES["prep_composite"] = f"""
    WITH keep AS (
      SELECT min(doc_id) AS doc_id
      FROM (SELECT doc_id, md5(text) AS h FROM documents) GROUP BY h
    ),
    survivors AS (SELECT d.* FROM documents d JOIN keep USING (doc_id)),
    wtoks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         t -> t <> '') AS wt
      FROM documents
    ),
    grams AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(wt) - 3, 0)),
               i -> array_to_string(list_slice(wt, i, i + 3), ' ')))) AS shingle
      FROM wtoks
    ),
    bench AS (SELECT DISTINCT shingle FROM grams WHERE doc_id % 50 = 0),
    contaminated AS (
      SELECT DISTINCT g.doc_id FROM grams g JOIN bench USING (shingle)
      WHERE g.doc_id % 50 <> 0
    ),
    decon AS (
      SELECT * FROM survivors
      WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ),
    ann AS (
      SELECT doc_id, lang, source, len(toks) AS n_tokens,
             round(
               least(CASE WHEN len(toks) > 0 THEN len(regexp_extract_all(lower(text), '\\b(the|a|and|of|to|in|is|it|for|on)\\b'))::DOUBLE / len(toks) ELSE 0 END * 2.5, 1.0) * 0.4
               + least(len(toks) / 64.0, 1.0) * 0.3
               + CASE WHEN length(text) > 0 THEN length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE / length(text) ELSE 0 END * 0.3
             , 4) AS quality
      FROM (SELECT *, {SQL_TOKENS.format(x='text')} AS toks FROM decon)
    ),
    gated AS (SELECT * FROM ann WHERE quality >= 0.3 AND n_tokens >= 5),
    sampled AS (
      SELECT * FROM (
        SELECT *,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|7'), 1, 15))::BIGINT
                 % 1000000 AS u
        FROM gated)
      WHERE u < CASE lang WHEN 'en' THEN 500000 WHEN 'de' THEN 250000
                          WHEN 'fr' THEN 100000 ELSE 0 END
    ),
    spans AS (
      SELECT source AS shard, doc_id, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS e
      FROM sampled WHERE n_tokens > 0
    )
    SELECT shard, seq_id, doc_id,
           CAST(greatest(0, (e - n_tokens) - seq_id * 512) AS BIGINT) AS begin,
           CAST(least(512, e - seq_id * 512) AS BIGINT) AS "end"
    FROM (
      SELECT *, unnest(generate_series(
               CAST(floor((e - n_tokens) / 512.0) AS BIGINT),
               CAST(floor((e - 1) / 512.0) AS BIGINT))) AS seq_id
      FROM spans
    )
"""


# ---------------------------------------------------------------------------
# Data quality (lake/quality.py): column profiling + constraint checks
# ---------------------------------------------------------------------------


def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass per-column profile (lake.quality.profile_columns) over
    orders — exact distinct so the oracle can reproduce the counts
    (production default is the HLL approx path, same single scan)."""
    from table2qb_spark.lake.quality import profile_columns

    orders = _t(spark, sf_dir, "orders")
    return profile_columns(
        orders,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"],
        exact_distinct=True,
    )


def q_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint checks (lake.quality.check_constraints) over
    lineitem: all four rule kinds, including a deliberately failing range
    check (max discount is 0.1) and a non-unique key tuple — both engines
    must agree on the exact violation counts."""
    from table2qb_spark.lake.quality import check_constraints

    li = _t(spark, sf_dir, "lineitem")
    return check_constraints(
        li,
        [
            "not_null:l_orderkey",
            "accepted:l_returnflag:A|N|R",
            "check:l_quantity >= 1 AND l_quantity <= 50",
            "check:l_discount >= 0 AND l_discount <= 0.08",
            "unique:l_orderkey,l_linenumber",
        ],
    )


ORACLES["column_profile"] = """
    SELECT 'o_orderkey' AS column_name, count(*)::BIGINT AS n_rows,
           (count(*) - count(o_orderkey))::BIGINT AS n_null,
           round((count(*) - count(o_orderkey))::DOUBLE / count(*), 4) AS null_frac,
           count(distinct o_orderkey)::BIGINT AS n_distinct,
           min(o_orderkey)::VARCHAR AS min_value, max(o_orderkey)::VARCHAR AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*)::BIGINT, (count(*) - count(o_custkey))::BIGINT,
           round((count(*) - count(o_custkey))::DOUBLE / count(*), 4),
           count(distinct o_custkey)::BIGINT,
           min(o_custkey)::VARCHAR, max(o_custkey)::VARCHAR
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*)::BIGINT, (count(*) - count(o_orderstatus))::BIGINT,
           round((count(*) - count(o_orderstatus))::DOUBLE / count(*), 4),
           count(distinct o_orderstatus)::BIGINT,
           min(o_orderstatus)::VARCHAR, max(o_orderstatus)::VARCHAR
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*)::BIGINT, (count(*) - count(o_orderpriority))::BIGINT,
           round((count(*) - count(o_orderpriority))::DOUBLE / count(*), 4),
           count(distinct o_orderpriority)::BIGINT,
           min(o_orderpriority)::VARCHAR, max(o_orderpriority)::VARCHAR
    FROM orders
"""

ORACLES["constraint_checks"] = """
    WITH r AS (
      SELECT 'not_null:l_orderkey' AS rule,
             sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS violations
      FROM lineitem
      UNION ALL
      SELECT 'accepted:l_returnflag:A|N|R',
             sum(CASE WHEN l_returnflag IS NOT NULL
                       AND l_returnflag NOT IN ('A', 'N', 'R')
                 THEN 1 ELSE 0 END)::BIGINT
      FROM lineitem
      UNION ALL
      SELECT 'check:l_quantity >= 1 AND l_quantity <= 50',
             sum(CASE WHEN NOT coalesce(l_quantity >= 1 AND l_quantity <= 50, FALSE)
                 THEN 1 ELSE 0 END)::BIGINT
      FROM lineitem
      UNION ALL
      SELECT 'check:l_discount >= 0 AND l_discount <= 0.08',
             sum(CASE WHEN NOT coalesce(l_discount >= 0 AND l_discount <= 0.08, FALSE)
                 THEN 1 ELSE 0 END)::BIGINT
      FROM lineitem
      UNION ALL
      SELECT 'unique:l_orderkey,l_linenumber', sum(c - 1)::BIGINT
      FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber)
    )
    SELECT rule, coalesce(violations, 0)::BIGINT AS violations,
           coalesce(violations, 0) = 0 AS passed
    FROM r
"""


# ---------------------------------------------------------------------------
# DSIR importance weighting / resampling (ops/importance.py)
# ---------------------------------------------------------------------------


def q_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR log importance weights (ops.importance.importance_weights):
    target = the English slice, raw = the whole documents table, 256
    hashed unigram+bigram buckets, add-1 smoothing. The oracle refits the
    identical two bucket models in DuckDB."""
    from table2qb_spark.ops import importance

    docs = _t(spark, sf_dir, "documents")
    target = docs.where(F.col("lang") == "en")
    return importance.importance_weights(docs, target, n_buckets=256, alpha=1.0)


def q_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel-top-k importance resampling (50 docs sampled without
    replacement proportional to softmax of the DSIR weights) — the
    deterministic per-doc Gumbel draw makes the selected SET identical
    across engines."""
    from table2qb_spark.ops import importance

    docs = _t(spark, sf_dir, "documents")
    target = docs.where(F.col("lang") == "en")
    return importance.importance_resample(
        docs, target, k=50, n_buckets=256, alpha=1.0, seed=42
    )


_SQL_DSIR_WEIGHTS = f"""
    WITH toks AS (
      SELECT doc_id, lang, {SQL_TOKENS.format(x='text')} AS toks FROM documents
    ), bg AS (
      SELECT doc_id, lang,
             unnest(toks[1:len(toks) - 1]) AS w1,
             unnest(toks[2:len(toks)]) AS w2
      FROM toks WHERE len(toks) >= 2
    ), feats AS (
      SELECT doc_id, lang, unnest(toks) AS f FROM toks
      UNION ALL
      SELECT doc_id, lang, w1 || ' ' || w2 AS f FROM bg
    ), fb AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(f), 1, 15))::BIGINT % 256 AS bucket
      FROM feats
    ), tc AS (
      SELECT bucket, count(*) AS t FROM fb WHERE lang = 'en' GROUP BY bucket
    ), rc AS (
      SELECT bucket, count(*) AS r FROM fb GROUP BY bucket
    ), tot AS (
      SELECT (SELECT count(*) FROM fb WHERE lang = 'en') AS tt,
             (SELECT count(*) FROM fb) AS rt
    ), ratio AS (
      SELECT rc.bucket,
             ln((coalesce(tc.t, 0) + 1.0) / (tot.tt + 256.0))
               - ln((rc.r + 1.0) / (tot.rt + 256.0)) AS log_ratio
      FROM rc LEFT JOIN tc USING (bucket) CROSS JOIN tot
    ), w AS (
      SELECT fb.doc_id, count(*)::INT AS n_feats,
             round(sum(ratio.log_ratio), 4) AS log_weight
      FROM fb JOIN ratio USING (bucket)
      GROUP BY fb.doc_id
    )
"""

ORACLES["importance_weights"] = _SQL_DSIR_WEIGHTS + """
    SELECT doc_id, n_feats, log_weight FROM w
"""

ORACLES["importance_resample"] = _SQL_DSIR_WEIGHTS + """
    , u AS (
      SELECT doc_id, log_weight,
             (('0x' || substr(md5(doc_id::VARCHAR || '|42'), 1, 15))::BIGINT
                % 1000000 + 0.5) / 1000000.0 AS u
      FROM w
    )
    SELECT doc_id, log_weight,
           round(log_weight + (-ln(-ln(u))), 4) AS gumbel_score
    FROM u ORDER BY gumbel_score DESC, doc_id LIMIT 50
"""


# ---------------------------------------------------------------------------
# Quality-aware exact dedup (ops/dedup.py::exact_dedup_keep_best)
# ---------------------------------------------------------------------------


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keeping each group's highest-scoring copy (n_chars as the
    sidecar quality signal; the 29-member fingerprint group in the fixture
    has 25 distinct scores AND score ties, so both the argmax and the
    min-id tie-break are exercised)."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        text.fingerprint_expr(F.col("text")).alias("text"),
        F.col("n_chars").alias("score"),
    )
    return dedup.exact_dedup_keep_best(
        docs, score_col="score", text_col="text", id_col="doc_id"
    )


ORACLES["dedup_keep_best"] = f"""
    WITH fp AS (
      SELECT doc_id, n_chars,
             md5(array_to_string(list_sort(list_distinct({SQL_TOKENS.format(x='text')})), ' ')) AS f
      FROM documents
    ), ranked AS (
      SELECT md5(f) AS content_hash, doc_id,
             round(n_chars::DOUBLE, 6) AS s,
             row_number() OVER (
               PARTITION BY f
               ORDER BY round(n_chars::DOUBLE, 6) DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY f) AS n_copies
      FROM fp
    )
    SELECT content_hash, doc_id AS keeper_id, s AS keeper_score, n_copies
    FROM ranked WHERE rn = 1
"""

QUERIES = {
    # The 18 round-5 additions lead: the driver samples ~50 of the 84
    # oracle entries per round in dict order, and these have never had
    # a driver-emitted CORRECTNESS row (round-5 verdict next-round #2).
    "prep_composite": q_prep_composite,
    "cdc_scd2": q_cdc_scd2,
    "cdc_row_lineage": q_cdc_row_lineage,
    "time_rollup": q_time_rollup,
    "importance_weights": q_importance_weights,
    "importance_resample": q_importance_resample,
    "dedup_keep_best": q_dedup_keep_best,
    "column_profile": q_column_profile,
    "constraint_checks": q_constraint_checks,
    "multimodal_av_headers": q_multimodal_av_headers,
    "semantic_dedup": q_semantic_dedup,
    "dedup_span_metrics": q_dedup_span_metrics,
    "dedup_paragraphs": q_dedup_paragraphs,
    "dedup_cross": q_dedup_cross,
    "dedup_groups_star": q_dedup_groups_star,
    "vocab_topk": q_vocab_topk,
    "shard_assignment": q_shard_assignment,
    "embedding_decontam": q_embedding_decontam,
    # long-green veterans
    "cube_observations": q_cube_observations,
    "uri_expand": q_uri_expand,
    "typed_observations": q_typed_observations,
    "observation_uri": q_observation_uri,
    "used_codes": q_used_codes,
    "component_specifications": q_component_specifications,
    "resolve_measures": q_resolve_measures,
    "slug_transforms": q_slug_transforms,
    "codelist_annotate": q_codelist_annotate,
    "rdf_triples": q_rdf_triples,
    "components_annotate": q_components_annotate,
    "codelist_resolution": q_codelist_resolution,
    "cdc_latest_state": q_cdc_latest_state,
    "cdc_latest_state_salted": q_cdc_latest_state_salted,
    "cdc_merge_upsert": q_cdc_merge_upsert,
    "cdc_patch_state": q_cdc_patch_state,
    "cdc_patch_merge": q_cdc_patch_merge,
    "cdc_patch_lake": q_cdc_patch_lake,
    "cdc_mor_state": q_cdc_mor_state,
    "cdc_delete_where": q_cdc_delete_where,
    "cdc_update_where": q_cdc_update_where,
    "cdc_merge_into": q_cdc_merge_into,
    "cdc_hot_keys": q_cdc_hot_keys,
    "pii_scrub": q_pii_scrub,
    "text_repetition": q_text_repetition,
    "web_quality": q_web_quality,
    "clean_lines": q_clean_lines,
    "token_entropy": q_token_entropy,
    "stratum_stats": q_stratum_stats,
    "repeated_spans": q_repeated_spans,
    "chunk_documents": q_chunk_documents,
    "boilerplate_removal": q_boilerplate_removal,
    "pack_sequences": q_pack_sequences,
    "url_canonical": q_url_canonical,
    "url_dedup": q_url_dedup,
    "quality_classifier": q_quality_classifier,
    "decontamination": q_decontamination,
    "bm25_topk": q_bm25_topk,
    "sample_stratified": q_sample_stratified,
    "cap_sources": q_cap_sources,
    "select_token_budget": q_select_token_budget,
    "bigram_logprob": q_bigram_logprob,
    "tfidf_keywords": q_tfidf_keywords,
    "corpus_mixture": q_corpus_mixture,
    "cdc_compact": q_cdc_compact,
    "cdc_incremental_read": q_cdc_incremental_read,
    "cdc_snapshot_diff": q_cdc_snapshot_diff,
    "lake_bloom_lookup": q_lake_bloom_lookup,
    "cdc_sessionize": q_cdc_sessionize,
    "cdc_asof_join": q_cdc_asof_join,
    "cdc_metrics": q_cdc_metrics,
    "text_analysis": q_text_analysis,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_mapping": q_dedup_mapping,
    "dedup_groups": q_dedup_groups,
    "dedup_simhash": q_dedup_simhash,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "embedding_neardup": q_embedding_neardup,
    "multimodal_meta": q_multimodal_meta,
    "multimodal_headers": q_multimodal_headers,
    "multimodal_decode": q_multimodal_decode,
    "pricing_summary": q_pricing_summary,
}
