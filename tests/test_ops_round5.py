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


class TestPrepUrlDedup:
    def test_url_stage_drops_cosmetic_url_variants(self, spark):
        """prep-data --url-col: docs fetched under cosmetically different
        URLs of the same page collapse to the min-id keeper BEFORE the
        content stages; distinct pages with distinct text all survive."""
        from table2qb_spark.ops.prep import prepare_training_data

        filler = " ".join(f"w{i}" for i in range(20))
        docs = spark.createDataFrame(
            [
                (1, f"page one {filler}", "en", "s",
                 "https://example.com/a?b=2&a=1", 10),
                (2, f"page one refetched {filler}", "en", "s",
                 "HTTPS://WWW.Example.COM:443/a/?a=1&utm_source=x&b=2#top", 10),
                (3, f"page two {filler}", "en", "s",
                 "https://example.com/b", 10),
            ],
            "doc_id long, text string, lang string, source string, "
            "url string, n_chars long",
        )
        clean, _ = prepare_training_data(docs, min_tokens=1, url_col="url")
        assert sorted(
            r["doc_id"] for r in clean.select("doc_id").collect()
        ) == [1, 3]


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


    def test_prep_incremental_since_snapshot(self, spark, tmp_path):
        """--since-snapshot: only the docs inserted/updated since that
        snapshot are prepped (bucket-pruned diff); a doc DELETED in the
        window never reaches the output, untouched docs are not re-prepped."""
        from table2qb_spark.ops.prep import run_prep

        t = self.make_doc_table(spark, tmp_path)
        # snapshots: 1 empty, 2 after b1, 3 after b2
        report = run_prep(
            spark, t.path, str(tmp_path / "out3"), min_tokens=1, since_snapshot=2
        )
        clean = spark.read.parquet(report["clean_path"])
        rows = {r["doc_id"]: r["text"] for r in clean.collect()}
        assert set(rows) == {2}  # updated; doc 3 deleted, doc 1 unchanged
        assert rows[2].startswith("doc two rewritten")
        assert report["mode"] == "incremental"
        assert report["since_snapshot"] == 2

    def test_prep_incremental_requires_lake_input(self, spark, tmp_path):
        import pytest as _pytest

        from table2qb_spark.ops.prep import run_prep

        plain = str(tmp_path / "plain.parquet")
        spark.createDataFrame(
            [(1, "t", "en", "s", 1)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(plain)
        with _pytest.raises(ValueError, match="lake-table"):
            run_prep(spark, plain, str(tmp_path / "o"), since_snapshot=1)


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


class TestCapSources:
    def docs(self, spark):
        # source "big" has 300 rows, "mid" 40, "tiny" 5
        rows = (
            [(i, "big") for i in range(300)]
            + [(1000 + i, "mid") for i in range(40)]
            + [(2000 + i, "tiny") for i in range(5)]
        )
        return spark.createDataFrame(rows, "doc_id long, source string")

    def test_under_cap_pass_through_and_big_capped(self, spark):
        from table2qb_spark.ops.sampling import cap_sources

        out = cap_sources(self.docs(spark), "source", 40, "doc_id", seed=3)
        per = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
        # sources at or under the cap keep EVERY row (threshold saturates)
        assert per["mid"] == 40 and per["tiny"] == 5
        # the hot source is capped in expectation (40/300 keep rate)
        assert 15 <= per["big"] <= 70

    def test_monotone_and_deterministic(self, spark):
        from table2qb_spark.ops.sampling import cap_sources

        docs = self.docs(spark)
        a = {r["doc_id"] for r in cap_sources(docs, "source", 20, "doc_id", seed=3).collect()}
        b = {r["doc_id"] for r in cap_sources(docs, "source", 80, "doc_id", seed=3).collect()}
        assert a <= b  # raising the cap only ADDS rows
        a2 = {r["doc_id"] for r in cap_sources(docs, "source", 20, "doc_id", seed=3).collect()}
        assert a == a2

    def test_plan_no_window_no_forced_broadcast(self, spark):
        from table2qb_spark.ops.sampling import cap_sources

        df = cap_sources(self.docs(spark), "source", 40, "doc_id")
        plan = df._jdf.queryExecution().executedPlan().toString()
        # hot-key-safe: no per-source window sort anywhere in the plan
        assert "Window" not in plan
        # join strategy left to AQE: the LOGICAL plan carries no broadcast hint
        logical = df._jdf.queryExecution().optimizedPlan().toString()
        assert "ResolvedHint" not in logical

    def test_invalid_cap_rejected(self, spark):
        from table2qb_spark.ops.sampling import cap_sources

        with pytest.raises(ValueError):
            cap_sources(self.docs(spark), "source", 0, "doc_id")


class TestHotKeys:
    def events(self, spark):
        rows = [(i, "hot", "a.py") for i in range(50)] + [
            (100 + i, f"r{i % 5}", "b.py") for i in range(25)
        ]
        return spark.createDataFrame(rows, "seq long, repo string, path string")

    def test_counts_share_and_order(self, spark):
        from table2qb_spark.cdc.dedup import hot_keys

        out = hot_keys(self.events(spark), ["repo", "path"], top_k=3).collect()
        assert (out[0]["repo"], out[0]["n_events"]) == ("hot", 50)
        assert out[0]["pct_of_batch"] == round(50 / 75 * 100, 4)
        # ties (r0..r4 all have 5 events) break by key: r0, r1 fill the top-3
        assert [(r["repo"], r["n_events"]) for r in out[1:]] == [("r0", 5), ("r1", 5)]

    def test_plan_topk_and_partial_agg(self, spark):
        from table2qb_spark.cdc.dedup import hot_keys

        plan = (
            hot_keys(self.events(spark), ["repo", "path"], top_k=3)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "TakeOrderedAndProject" in plan
        assert "partial_count" in plan  # map-side combine on the hot key


class TestSelectTokenBudget:
    def fixture(self, spark):
        # (doc_id, quality, n_tokens); quality buckets with ties
        rows = [
            (1, 0.9, 100), (2, 0.9, 100),            # bucket 0.9: 200
            (3, 0.8, 150), (4, 0.8, 150), (5, 0.8, 150),  # bucket 0.8: 450
            (6, 0.5, 300),                            # bucket 0.5: 300
        ]
        return spark.createDataFrame(rows, "doc_id long, quality double, n_tokens long")

    def brute(self, rows, budget):
        out, cum = [], 0
        for r in sorted(rows, key=lambda r: (-r[1], r[0])):
            cum += r[2]
            if cum <= budget:
                out.append(r[0])
        return sorted(out)

    def test_matches_global_running_sum_at_many_budgets(self, spark):
        from table2qb_spark.ops.sampling import select_token_budget

        df = self.fixture(spark)
        rows = [(r["doc_id"], r["quality"], r["n_tokens"]) for r in df.collect()]
        for budget in (50, 100, 200, 350, 500, 650, 649, 651, 950, 2000):
            got = sorted(
                r["doc_id"]
                for r in select_token_budget(df, budget).collect()
            )
            assert got == self.brute(rows, budget), budget

    def test_boundary_partial_bucket_in_key_order(self, spark):
        from table2qb_spark.ops.sampling import select_token_budget

        # budget 500: full 0.9 bucket (200) + docs 3,4 of the 0.8 bucket
        got = sorted(
            r["doc_id"] for r in select_token_budget(self.fixture(spark), 500).collect()
        )
        assert got == [1, 2, 3, 4]

    def test_whole_corpus_fits(self, spark):
        from table2qb_spark.ops.sampling import select_token_budget

        assert select_token_budget(self.fixture(spark), 10_000).count() == 6

    def test_invalid_budget(self, spark):
        from table2qb_spark.ops.sampling import select_token_budget

        with pytest.raises(ValueError):
            select_token_budget(self.fixture(spark), 0)


class TestBigramLogprob:
    def test_hand_computed_model(self, spark):
        """vocab_k=2 on {a,b,z}: z -> <unk>; bigram counts (a,b)=2 (b,a)=1
        (a,a)=1; openers a=3 b=1; V=3, alpha=.5 — scores check by hand."""
        import math

        from table2qb_spark.ops.text import bigram_logprob

        docs = spark.createDataFrame(
            [(1, "a b a b"), (2, "a a"), (3, "z")], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in bigram_logprob(docs, vocab_k=2).collect()}
        p_ab = 2.5 / 4.5
        p_ba = 1.5 / 2.5
        p_aa = 1.5 / 4.5
        exp1 = round(-(2 * math.log2(p_ab) + math.log2(p_ba)) / 3, 4)
        assert out[1]["bits_per_bigram"] == pytest.approx(exp1)
        assert out[1]["n_bigrams"] == 3
        assert out[2]["bits_per_bigram"] == pytest.approx(round(-math.log2(p_aa), 4))
        # single-token doc: no bigrams, NULL score (never dropped)
        assert out[3]["bits_per_bigram"] is None and out[3]["n_bigrams"] is None

    def test_repetitive_doc_scores_lower_than_random(self, spark):
        from table2qb_spark.ops.text import bigram_logprob

        docs = spark.createDataFrame(
            [(1, "the cat sat " * 30), (2, "q98 zz7 kfj w0x mnb vvq a1 b2 c3 d4")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["bits_per_bigram"] for r in bigram_logprob(docs, vocab_k=5).collect()}
        assert out[1] < out[2]  # corpus-like repetition beats OOV noise

    def test_plan_no_cartesian_no_python(self, spark):
        from table2qb_spark.ops.text import bigram_logprob

        docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        plan = bigram_logprob(docs)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan


class TestTfidfKeywords:
    def test_idf_favors_distinctive_terms(self, spark):
        from table2qb_spark.ops.retrieval import tfidf_keywords

        docs = spark.createDataFrame(
            [
                (1, "common common zebra zebra zebra"),
                (2, "common unique"),
                (3, "common filler words here"),
            ],
            "doc_id long, text string",
        )
        out = {(r["doc_id"], r["rank"]): r["term"] for r in tfidf_keywords(docs, m=2).collect()}
        # 'zebra' (df=1, tf=3) must outrank 'common' (df=3) for doc 1
        assert out[(1, 1)] == "zebra" and out[(1, 2)] == "common"
        assert out[(2, 1)] == "unique"

    def test_rank_bounded_and_deterministic_ties(self, spark):
        from table2qb_spark.ops.retrieval import tfidf_keywords

        docs = spark.createDataFrame(
            [(1, "b a c"), (2, "x")], "doc_id long, text string"
        )
        rows = tfidf_keywords(docs, m=2).collect()
        per_doc = {}
        for r in rows:
            per_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"]))
        # equal scores (all df=1, tf=1) tie-break alphabetically
        assert sorted(per_doc[1]) == [(1, "a"), (2, "b")]
        assert per_doc[2] == [(1, "x")]

    def test_plan_no_per_term_window(self, spark):
        """The ONLY window partitions by doc id (bounded by doc length);
        df must come from an aggregate of the tf table, not a
        countDistinct over raw tokens (no Expand)."""
        from table2qb_spark.ops.retrieval import tfidf_keywords

        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        plan = tfidf_keywords(docs)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Window [") == 1
        # Spark's group-limit pushdown: a PARTIAL per-partition top-m runs
        # before the exchange, so a huge doc never ships all its terms
        assert "WindowGroupLimit" in plan and "Partial" in plan
        assert "Expand" not in plan
        assert "CartesianProduct" not in plan


class TestPrepBigramGate:
    def test_lm_gate_drops_noisy_doc(self, spark):
        """--max-bits-per-bigram: the OOV-noise doc scores far above the
        corpus-like docs and is gated; short docs (NULL score) pass."""
        from table2qb_spark.ops.prep import prepare_training_data

        body = "the cat sat on the mat and the dog ran " * 4
        docs = spark.createDataFrame(
            [
                (1, body + "one", "en", "s0", 10),
                (2, body + "two", "en", "s0", 10),
                (3, "zq9 xj2 wv7 kp4 mn8 bc5 fg1 hd3 lt6 rs0 " * 4, "en", "s0", 10),
                (4, "tiny", "en", "s0", 10),  # no bigrams -> NULL -> passes
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        from table2qb_spark.ops.text import bigram_logprob

        scores = {
            r["doc_id"]: r["bits_per_bigram"]
            for r in bigram_logprob(docs, vocab_k=20).collect()
        }
        # threshold between the corpus-like docs and the noise doc
        thr = (max(scores[1], scores[2]) + scores[3]) / 2
        clean, _ = prepare_training_data(
            docs, min_tokens=1, max_bits_per_bigram=thr, bigram_vocab_k=20
        )
        kept = sorted(r["doc_id"] for r in clean.select("doc_id").collect())
        assert kept == [1, 2, 4]


class TestCleanLines:
    def docs(self, spark):
        return spark.createDataFrame(
            [
                (
                    1,
                    "- bullet nav item\n"
                    "This sentence has plenty of words and ends well.\n"
                    "please enable javascript to view this page.\n"
                    "too short.\n"
                    "Another proper sentence with enough words here!\n"
                    "no terminal punctuation on this longer line here",
                ),
                (2, ""),
            ],
            "doc_id long, text string",
        )

    def test_c4_line_rules(self, spark):
        from table2qb_spark.ops.text import clean_lines_exprs

        rows = {
            r["doc_id"]: r
            for r in self.docs(spark)
            .select("doc_id", *clean_lines_exprs(F.col("text")))
            .collect()
        }
        assert rows[1]["clean_text"] == (
            "This sentence has plenty of words and ends well.\n"
            "Another proper sentence with enough words here!"
        )
        assert rows[1]["n_lines_kept"] == 2
        assert rows[1]["n_lines_total"] == 6
        # empty doc: zero lines, empty clean text — caller gates on kept
        assert rows[2]["clean_text"] == "" and rows[2]["n_lines_kept"] == 0

    def test_shuffle_free_plan(self, spark):
        from table2qb_spark.ops.text import clean_lines_exprs

        plan = (
            self.docs(spark)
            .select("doc_id", *clean_lines_exprs(F.col("text")))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan


class TestTokenEntropy:
    def test_known_distributions(self, spark):
        from table2qb_spark.ops.text import token_entropy_expr

        docs = spark.createDataFrame(
            [
                (1, "a a a a"),          # one symbol -> 0 bits
                (2, "a b a b"),          # uniform over 2 -> 1 bit
                (3, "a b c d"),          # uniform over 4 -> 2 bits
                (4, "a a a b"),          # H(3/4,1/4) = 0.8113
                (5, ""),                 # empty -> 0.0, must not error (ANSI)
                (6, "solo"),             # single token -> 0 bits
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["entropy_bits"]
            for r in docs.select(
                "doc_id", token_entropy_expr(F.col("text")).alias("entropy_bits")
            ).collect()
        }
        assert got == {1: 0.0, 2: 1.0, 3: 2.0, 4: 0.8113, 5: 0.0, 6: 0.0}

    def test_shuffle_free_plan(self, spark):
        from table2qb_spark.ops.text import token_entropy_expr

        docs = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
        plan = (
            docs.select("doc_id", token_entropy_expr(F.col("text")).alias("h"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan


class TestPrepC4Lines:
    def test_line_filter_before_dedup(self, spark):
        """--c4-lines: line-level cleaning runs BEFORE exact dedup, so two
        docs differing only in boilerplate lines collapse to one; docs with
        no surviving line drop out entirely."""
        from table2qb_spark.ops.prep import prepare_training_data

        body = "This sentence has plenty of words and ends well."
        docs = spark.createDataFrame(
            [
                (1, f"- nav bar\n{body}", "en", "s0", 10),
                (2, f"{body}\nclick here now", "en", "s0", 10),  # dup after clean
                (3, "- only\n- bullets\n- here", "en", "s0", 10),  # all dropped
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        clean, _ = prepare_training_data(
            docs, min_tokens=1, c4_line_filter=True, c4_min_words=5
        )
        rows = clean.select("doc_id", "text").collect()
        assert sorted(r["doc_id"] for r in rows) == [1]
        assert rows[0]["text"] == body


class TestRepeatedSpans:
    @pytest.fixture()
    def docs(self, spark):
        shared = " ".join(f"tok{i}" for i in range(12))  # a 12-token run
        return spark.createDataFrame(
            [
                (1, shared + " unique tail one two three four five six"),
                # 4-token prefix: the run sits at an offset ALIGNED with
                # doc 1's stride-2 grid (an odd prefix would misalign every
                # window — the documented recall limit vs a suffix array)
                (2, "prefix words sit here " + shared + " other ending"),
                (3, "completely different body with no shared windows at all here"),
                (4, "short doc"),  # shorter than one window -> no rows
            ],
            "doc_id long, text string",
        )

    def test_detects_only_aligned_shared_windows(self, spark, docs):
        from table2qb_spark.ops.text import repeated_window_spans

        got = repeated_window_spans(
            docs, window_tokens=4, stride=2, min_df=2
        )
        rows = got.collect()
        assert {r["doc_id"] for r in rows} == {1, 2}
        # doc 1 carries the shared run at tokens 0..11 (windows 0,2,4,6,8);
        # doc 2 carries it at tokens 4..15 (windows 4,6,8,10,12) — the
        # run-relative offsets line up, so all five windows hash-match
        d1 = sorted(r["win_start"] for r in rows if r["doc_id"] == 1)
        d2 = sorted(r["win_start"] for r in rows if r["doc_id"] == 2)
        assert d1 == [0, 2, 4, 6, 8]
        assert d2 == [4, 6, 8, 10, 12]
        assert all(r["doc_df"] == 2 for r in rows)

    def test_merge_token_spans_islands(self, spark):
        from table2qb_spark.ops.text import merge_token_spans

        spans = spark.createDataFrame(
            # doc 1: 0,2,4 overlap into [0,8); 20 is its own island [20,24)
            # doc 2: adjacent-but-not-overlapping windows 0 and 4 merge
            #        (4 <= prev end 4 -> same island, half-open adjacency)
            [(1, 0, "h", 2), (1, 2, "h", 2), (1, 4, "h", 2), (1, 20, "h", 2),
             (2, 0, "h", 2), (2, 4, "h", 2)],
            "doc_id long, win_start int, win_hash string, doc_df long",
        )
        got = {
            (r["doc_id"], r["span_start"], r["span_end"])
            for r in merge_token_spans(spans, window_tokens=4).collect()
        }
        assert got == {(1, 0, 8), (1, 20, 24), (2, 0, 8)}

    def test_short_docs_emit_nothing(self, spark, docs):
        from table2qb_spark.ops.text import repeated_window_spans

        got = repeated_window_spans(
            docs.where("doc_id = 4"), window_tokens=4, stride=2, min_df=1
        )
        assert got.count() == 0

    def test_merge_plan_single_exchange(self, spark, docs):
        from table2qb_spark.ops.text import (
            merge_token_spans,
            repeated_window_spans,
        )

        spans = spark.createDataFrame(
            [(1, 0, "h", 2)], "doc_id long, win_start int, win_hash string, doc_df long"
        )
        plan = (
            merge_token_spans(spans)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # distinct + two windows + groupBy all share hashpartitioning(doc_id):
        # distinct needs (doc_id, win_start); windows/group need doc_id — at
        # most TWO exchanges end-to-end, never one per window/agg step
        assert plan.count("Exchange hashpartitioning") <= 2, plan
        # the window-hash hot-set join strategy stays AQE's choice: no
        # forced broadcast hint in repeated_window_spans
        optimized = (
            repeated_window_spans(docs)
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "broadcast" not in optimized.lower(), optimized
