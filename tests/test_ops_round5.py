"""Round-5 training-data operators: incremental cross-corpus dedup,
corpus-level paragraph dedup, vocabulary top-k, deterministic shard
export, and embedding-space decontamination — semantics plus the
scale-shape plan audits (map-side-combinable aggregates, equi-joins only,
top-k as TakeOrderedAndProject, no corpus-sized window keys)."""

import pytest
from pyspark.sql import functions as F

from table2qb_spark.ops import ann, dedup
from table2qb_spark.ops.decontam import embedding_contamination
from table2qb_spark.ops.sampling import assign_shards
from table2qb_spark.ops.text import dedup_paragraphs, vocab_topk

EMB = "/root/testdata/sf0.001/embeddings.parquet"


class TestCrossDedup:
    def fixture(self, spark):
        incoming = spark.createDataFrame(
            [
                (10, "alpha beta"),     # already in corpus -> dropped
                (11, "fresh one"),      # fresh, unique
                (12, "fresh two"),      # fresh, duplicated within batch
                (13, "fresh two"),      #   -> collapsed to keeper 12
                (14, "gamma delta"),    # already in corpus -> dropped
            ],
            "doc_id long, text string",
        )
        existing = spark.createDataFrame(
            [(1, "alpha beta"), (2, "gamma delta"), (3, "epsilon")],
            "doc_id long, text string",
        )
        return incoming, existing

    def test_drops_seen_and_collapses_batch(self, spark):
        incoming, existing = self.fixture(spark)
        out = dedup.cross_dedup(incoming, existing)
        rows = {r["doc_id"]: r["batch_copies"] for r in out.collect()}
        assert rows == {11: 1, 12: 2}

    def test_row_level_mode(self, spark):
        incoming, existing = self.fixture(spark)
        out = dedup.cross_dedup(incoming, existing, within_batch=False)
        assert sorted(r["doc_id"] for r in out.collect()) == [11, 12, 13]

    def test_no_forced_broadcast_no_cartesian(self, spark):
        incoming, existing = self.fixture(spark)
        plan = (
            dedup.cross_dedup(incoming, existing)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestDedupParagraphs:
    def docs(self, spark):
        return spark.createDataFrame(
            [
                (1, "shared para\nunique one\nshared para"),  # in-doc repeat
                (2, "unique two\nshared para"),               # cross-doc repeat
                (3, "shared para"),                           # fully redundant
                (4, "unique three"),
            ],
            "doc_id long, text string",
        )

    def test_keeps_first_occurrence_only(self, spark):
        out = {
            r["doc_id"]: r
            for r in dedup_paragraphs(self.docs(spark)).collect()
        }
        # doc 1 owns the first 'shared para' (idx 0); its idx-2 repeat drops
        assert out[1]["text"] == "shared para\nunique one"
        assert (out[1]["n_paras"], out[1]["n_kept"]) == (3, 2)
        assert out[2]["text"] == "unique two"
        assert out[4]["text"] == "unique three"
        # doc 3 is fully redundant -> absent
        assert 3 not in out

    def test_rebuild_preserves_original_order(self, spark):
        docs = spark.createDataFrame(
            [(1, "z last\na first\nm middle")], "doc_id long, text string"
        )
        out = dedup_paragraphs(docs).collect()[0]
        assert out["text"] == "z last\na first\nm middle"

    def test_plan_is_agg_join_not_window(self, spark):
        """First-occurrence selection must be the map-side-combinable
        min(struct) aggregate + semi-join, NEVER a row_number window over
        md5(para): a boilerplate paragraph shared by 10^9 docs is ONE
        window key = one straggler task, while partial min aggregates
        shrink it inside every map task."""
        plan = (
            dedup_paragraphs(self.docs(spark))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Window" not in plan
        assert "CartesianProduct" not in plan
        assert "partial_min" in plan.lower() or "partialmerge" in plan.lower() or plan.count("HashAggregate") >= 2


class TestVocabTopk:
    def test_counts_and_total_order(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "apple apple banana"),
                (2, "apple cherry"),
                (3, "banana apple"),
            ],
            "doc_id long, text string",
        )
        rows = vocab_topk(docs, k=2).collect()
        assert [(r["token"], r["tf"], r["df"]) for r in rows] == [
            ("apple", 4, 3),
            ("banana", 2, 2),
        ]

    def test_topk_is_take_ordered(self, spark):
        docs = spark.range(10).select(
            F.col("id").alias("doc_id"), F.lit("a b c").alias("text")
        )
        plan = vocab_topk(docs, k=5)._jdf.queryExecution().executedPlan().toString()
        # global top-k must be per-partition heaps, not a full global sort,
        # and the (tf, df) pair must come from two partial aggs, not expand
        assert "TakeOrderedAndProject" in plan
        assert "Expand" not in plan


class TestAssignShards:
    def docs(self, spark, n=200):
        return spark.range(n).select(F.col("id").alias("doc_id"))

    def test_deterministic_and_partitioning_independent(self, spark):
        a = assign_shards(self.docs(spark), 8, "doc_id", seed=7).collect()
        b = assign_shards(
            self.docs(spark).repartition(13), 8, "doc_id", seed=7
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_pos_dense_per_shard(self, spark):
        rows = assign_shards(self.docs(spark), 4, "doc_id", seed=7).collect()
        by_shard = {}
        for r in rows:
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        assert set(by_shard) <= set(range(4))
        for positions in by_shard.values():
            assert sorted(positions) == list(range(len(positions)))

    def test_seed_reshuffles(self, spark):
        a = {r["doc_id"]: r["shard"] for r in assign_shards(self.docs(spark), 8, "doc_id", seed=7).collect()}
        b = {r["doc_id"]: r["shard"] for r in assign_shards(self.docs(spark), 8, "doc_id", seed=8).collect()}
        assert a != b


class TestEmbeddingDecontam:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        return spark.read.parquet(EMB)

    def test_subset_of_exact_with_identical_hits(self, spark, emb):
        """IVF recall sanity: every flagged (id, max_cosine) also appears
        under brute force, and the approximation only MISSES cross-cell
        contamination (never invents hits)."""
        bench = emb.where(F.col("vec_id") % 10 == 0)
        corpus = emb.where(F.col("vec_id") % 10 != 0)
        cents = ann.seed_centroids(emb, 8)
        ivf = {
            r["vec_id"]: (r["n_hits"], r["max_cosine"])
            for r in embedding_contamination(
                corpus, bench, threshold=0.3, centroids=cents
            ).collect()
        }
        b = bench.select(F.col("vec_id").alias("bid"), F.col("embedding").alias("bv"))
        exact = {
            r["vec_id"]: (r["n_hits"], r["max_cosine"])
            for r in corpus.join(b)
            .select(
                "vec_id",
                F.round(ann.cosine_expr(F.col("embedding"), F.col("bv")), 4).alias("c"),
            )
            .where(F.col("c") >= 0.3)
            .groupBy("vec_id")
            .agg(F.count(F.lit(1)).alias("n_hits"), F.max("c").alias("max_cosine"))
            .collect()
        }
        assert ivf, "fixture threshold should flag something"
        assert set(ivf) <= set(exact)
        for vid, (n, mc) in ivf.items():
            # IVF sees a SUBSET of each id's benchmark neighbors (same-cell
            # only), so its hit count and strongest-match cosine are lower
            # bounds of the exact ones — never higher, never fabricated
            assert mc <= exact[vid][1]
            assert n <= exact[vid][0]

    def test_match_is_equijoin(self, spark, emb):
        bench = emb.where(F.col("vec_id") % 10 == 0)
        corpus = emb.where(F.col("vec_id") % 10 != 0)
        plan = (
            embedding_contamination(
                corpus, bench, threshold=0.3, centroids=ann.seed_centroids(emb, 8)
            )
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        # the only nested-loop joins are the two tiny centroid probes
        assert plan.count("BroadcastNestedLoopJoin") <= 2


class TestPrepIncrementalIngest:
    def test_existing_corpus_filters_batch(self, spark):
        """prep-data --dedup-against: batch content already present in the
        existing corpus is dropped; fresh content flows through the rest
        of the composite untouched; within-batch dupes collapse."""
        from table2qb_spark.ops.prep import prepare_training_data

        filler = " ".join(f"w{i}" for i in range(20))
        existing = spark.createDataFrame(
            [(1, f"seen before {filler}", "en", "s0", 10)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        batch = spark.createDataFrame(
            [
                (100, f"seen before {filler}", "en", "s1", 10),   # in corpus
                (101, f"brand new text {filler}", "en", "s1", 10),
                (102, f"brand new text {filler}", "en", "s1", 10),  # batch dup
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        clean, _ = prepare_training_data(batch, existing=existing, min_tokens=1)
        assert sorted(r["doc_id"] for r in clean.select("doc_id").collect()) == [101]


class TestPrepFromLake:
    def make_doc_table(self, spark, tmp_path):
        from table2qb_spark.lake.merge import merge_upsert
        from table2qb_spark.lake.table import LakeTable

        t = LakeTable.create(
            spark, str(tmp_path / "doclake"),
            [("doc_id", "long"), ("text", "string"), ("lang", "string"),
             ("source", "string"), ("n_chars", "long")],
            ["doc_id"], n_buckets=4,
        )
        filler = " ".join(f"w{i}" for i in range(20))
        b1 = spark.createDataFrame(
            [
                (1, "I", 1, f"doc one {filler}", "en", "s0", 10),
                (2, "I", 2, f"doc two {filler}", "en", "s0", 10),
                (3, "I", 3, f"doc three {filler}", "en", "s0", 10),
            ],
            "seq long, op string, doc_id long, text string, lang string, source string, n_chars long",
        )
        merge_upsert(t, b1, "b1")
        b2 = spark.createDataFrame(
            [
                (4, "U", 2, f"doc two rewritten {filler}", "en", "s0", 10),
                (5, "D", 3, None, None, None, None),
            ],
            "seq long, op string, doc_id long, text string, lang string, source string, n_chars long",
        )
        merge_upsert(t, b2, "b2")
        return t

    def test_prep_reads_live_lake_state(self, spark, tmp_path):
        """prep-data --documents <lake root>: the corpus is the
        MERGE-maintained live state — the deleted doc never reaches the
        training set, the updated doc contributes its NEW text."""
        from table2qb_spark.ops.prep import run_prep

        t = self.make_doc_table(spark, tmp_path)
        report = run_prep(spark, t.path, str(tmp_path / "out"), min_tokens=1)
        clean = spark.read.parquet(report["clean_path"])
        rows = {r["doc_id"]: r["text"] for r in clean.collect()}
        assert set(rows) == {1, 2}
        assert rows[2].startswith("doc two rewritten")

    def test_prep_time_travel_snapshot(self, spark, tmp_path):
        """--snapshot N preps the corpus as of that snapshot: before the
        second merge, doc 3 still exists and doc 2 has its old text."""
        from table2qb_spark.ops.prep import run_prep

        t = self.make_doc_table(spark, tmp_path)
        # snapshot 1 = empty created table; first merge lands as snapshot 2
        report = run_prep(
            spark, t.path, str(tmp_path / "out2"), min_tokens=1, snapshot_id=2
        )
        clean = spark.read.parquet(report["clean_path"])
        rows = {r["doc_id"]: r["text"] for r in clean.collect()}
        assert set(rows) == {1, 2, 3}
        assert rows[2].startswith("doc two ") and "rewritten" not in rows[2]


class TestAllQueryPlansScaleGuard:
    """Blanket scale audit over the ENTIRE driver-contract query catalog:
    no query's physical plan may contain a Cartesian product or a
    row-at-a-time Python UDF (BatchEvalPython). Arrow-vectorized Python
    (ArrowEvalPython / MapInPandas) is allowed only where no Catalyst
    equivalent exists (multimodal codec decode; the slug_transforms query
    deliberately exercises the pandas twins against their Catalyst forms).
    This pins the repo-wide invariant the per-op plan tests check locally:
    adding query #55 with an accidental cross join or per-row Python fails
    here, not at 100 TB."""

    # queries whose CONTRACT is to run the Arrow-vectorized pandas twins
    ARROW_OK = {
        "slug_transforms",      # pandas twins fuzz-pinned vs Catalyst
        "uri_expand",           # pct-encode pandas twin
        "multimodal_decode",    # codec decode: no Catalyst equivalent
        "multimodal_headers",   # container-header parse in mapInPandas
        "multimodal_av_headers",
    }

    def test_no_cartesian_no_row_python_anywhere(self, spark):
        from table2qb_spark import entry_queries as eq

        sf_dir = "/root/testdata/sf0.001"
        failures = []
        for name, fn in sorted(eq.QUERIES.items()):
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            if "CartesianProduct" in plan:
                failures.append(f"{name}: CartesianProduct")
            if "BatchEvalPython" in plan:
                failures.append(f"{name}: row-at-a-time BatchEvalPython")
            if name not in self.ARROW_OK and (
                "ArrowEvalPython" in plan or "MapInPandas" in plan
            ):
                failures.append(f"{name}: unexpected Python stage")
        assert not failures, failures


class TestMixCorpus:
    def docs(self, spark):
        return spark.createDataFrame(
            [(i, "en" if i % 3 == 0 else ("de" if i % 3 == 1 else "fr"), 100 + i)
             for i in range(60)],
            "doc_id long, lang string, n_chars long",
        )

    def test_full_epochs_exact(self, spark):
        from table2qb_spark.ops.sampling import mix_corpus

        out = mix_corpus(
            self.docs(spark), "lang", {"de": 2.0}, "doc_id", seed=5
        ).collect()
        # de rows appear exactly twice (epochs 0 and 1); everything else dropped
        assert all(r["lang"] == "de" for r in out)
        per_doc = {}
        for r in out:
            per_doc.setdefault(r["doc_id"], []).append(r["epoch"])
        assert all(sorted(v) == [0, 1] for v in per_doc.values())
        assert len(per_doc) == 20

    def test_monotone_in_weight(self, spark):
        """copies(w) is monotone in w: raising a weight only ADDS copies."""
        from table2qb_spark.ops.sampling import mix_corpus

        docs = self.docs(spark)
        for lo, hi in [(0.3, 0.9), (0.9, 1.0), (0.7, 1.2), (1.5, 2.0)]:
            a = mix_corpus(docs, "lang", {"en": lo}, "doc_id", seed=5)
            b = mix_corpus(docs, "lang", {"en": hi}, "doc_id", seed=5)
            ca = {r["doc_id"]: r["cnt"] for r in a.groupBy("doc_id").agg(F.count("*").alias("cnt")).collect()}
            cb = {r["doc_id"]: r["cnt"] for r in b.groupBy("doc_id").agg(F.count("*").alias("cnt")).collect()}
            assert all(cb.get(k, 0) >= v for k, v in ca.items()), (lo, hi)

    def test_fractional_rate(self, spark):
        from table2qb_spark.ops.sampling import mix_corpus

        big = spark.range(0, 5000).select(
            F.col("id").alias("doc_id"), F.lit("en").alias("lang")
        )
        n = mix_corpus(big, "lang", {"en": 1.5}, "doc_id", seed=9).count()
        assert 5000 * 1.4 < n < 5000 * 1.6

    def test_shuffle_free_plan(self, spark):
        from table2qb_spark.ops.sampling import mix_corpus

        plan = (
            mix_corpus(self.docs(spark), "lang", {"en": 1.5}, "doc_id")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan

    def test_negative_weight_rejected(self, spark):
        from table2qb_spark.ops.sampling import mix_corpus

        with pytest.raises(ValueError):
            mix_corpus(self.docs(spark), "lang", {"en": -0.5}, "doc_id")

    def test_plan_mixture_weights(self, spark):
        from table2qb_spark.ops.sampling import plan_mixture

        docs = self.docs(spark)
        # measured tokens: en docs are ids 0,3,..57 -> sum(100+i); compute directly
        toks = {r["lang"]: r["t"] for r in docs.groupBy("lang").agg(F.sum("n_chars").alias("t")).collect()}
        plan = plan_mixture(docs, "lang", "n_chars", {"en": 0.6, "fr": 0.4}, 10_000)
        assert plan["en"] == pytest.approx(0.6 * 10_000 / toks["en"])
        assert plan["fr"] == pytest.approx(0.4 * 10_000 / toks["fr"])
        # stratum absent from the corpus never yields an inf weight
        plan2 = plan_mixture(docs, "lang", "n_chars", {"xx": 1.0}, 10_000)
        assert plan2 == {}


class TestPrepMixture:
    def test_mixture_stage_epochs_and_packed_index(self, spark):
        """prep-data --mixture: copies carry epoch, the packed index keys on
        (doc_id, epoch), and per-lang multiplicities follow the weights."""
        from table2qb_spark.ops.prep import prepare_training_data

        filler = " ".join(f"w{i}" for i in range(20))
        docs = spark.createDataFrame(
            [(i, f"doc {i} {filler}", "en" if i % 2 == 0 else "de", f"s{i % 2}", 50)
             for i in range(40)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        clean, packed = prepare_training_data(
            docs, min_tokens=1, mixture_weights={"en": 2.0, "de": 0.5}, seed=3
        )
        rows = clean.select("doc_id", "lang", "epoch").collect()
        en = [r for r in rows if r["lang"] == "en"]
        de = [r for r in rows if r["lang"] == "de"]
        assert len(en) == 40  # 20 docs x 2 full epochs
        assert {r["epoch"] for r in en} == {0, 1}
        assert 0 < len(de) < 20 and all(r["epoch"] == 0 for r in de)
        p = packed.collect()
        assert "epoch" in packed.columns
        # every (doc_id, epoch) copy that survived is packed at least once
        assert {(r["doc_id"], r["epoch"]) for r in p} >= {
            (r["doc_id"], r["epoch"]) for r in rows
        }
