"""Scale-shape audits for the LLM-data operators: the dedup/ANN paths that
looked right at 60k rows but would die at 100 TB — near-dup pairing must be
an equi-join on a bucket key (never a nested-loop all-pairs join), and the
shingle inverted index must cap hot-shingle document frequency before its
self-join."""

import pytest
from pyspark.sql import functions as F

from table2qb_spark.ops import ann, dedup

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB)


class TestCosineNeardup:
    def test_default_path_pairs_via_equijoin(self, spark, emb):
        """The pair join must be hash/sort-merge on centroid_id. The only
        nested-loop nodes allowed are the two tiny-broadcast centroid probes
        inside ivf_assign (corpus x 8 centroids) — never vector x vector."""
        pairs = ann.cosine_neardup_pairs(emb, threshold=0.3, n_centroids=8)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert plan.count("BroadcastNestedLoopJoin") <= 2  # centroid probes only
        assert any(
            f"{j} [centroid_id" in plan or f"{j}(centroid_id" in plan
            for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
        ), plan

    def test_ivf_pairs_subset_of_exact_with_identical_cosines(self, spark, emb):
        """Recall sanity: every IVF pair is an exact pair with the same
        cosine; the approximation only MISSES cross-cell pairs."""
        thr = 0.3
        ivf = {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in ann.cosine_neardup_pairs(emb, threshold=thr, n_centroids=8).collect()
        }
        exact = {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in ann.cosine_neardup_pairs(emb, threshold=thr, exact=True).collect()
        }
        assert ivf, "fixture threshold should produce pairs"
        assert set(ivf) <= set(exact)
        assert all(exact[k] == v for k, v in ivf.items())


class TestNgramJaccardHotShingleCap:
    def docs(self, spark):
        # 6 docs all sharing one hot 3-gram ("the common phrase"); only
        # docs 1/2 are genuinely similar beyond it
        hot = "the common phrase"
        rows = [
            (1, f"{hot} alpha beta gamma delta one two"),
            (2, f"{hot} alpha beta gamma delta one three"),
            (3, f"{hot} completely different text here now"),
            (4, f"{hot} unrelated words occupy this line too"),
            (5, f"{hot} nothing shared with anything else here"),
            (6, f"{hot} final doc with its own content"),
        ]
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_cap_drops_hot_shingle_pairs_but_keeps_real_dups(self, spark):
        df = self.docs(spark)
        # uncapped: the hot shingle alone links every doc pair
        uncapped = dedup.ngram_jaccard_pairs(df, threshold=0.01, max_df=None)
        assert uncapped.count() == 15  # all 6*5/2 pairs linked by the hot gram
        # capped at df<=3: the hot shingle (df=6) leaves pair generation;
        # only the genuinely-overlapping pair (1,2) survives
        capped = dedup.ngram_jaccard_pairs(df, threshold=0.01, max_df=3)
        got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
        assert got == {(1, 2)}

    def test_cap_keeps_denominator_exact(self, spark):
        """Set sizes count ALL shingles, so jaccard for surviving pairs is
        computed against the true set sizes (only `common` can shrink)."""
        df = self.docs(spark)
        row = (
            dedup.ngram_jaccard_pairs(df, threshold=0.01, max_df=3)
            .where((F.col("id_a") == 1) & (F.col("id_b") == 2))
            .collect()[0]
        )
        # docs 1 and 2: 9 tokens -> 7 shingles each; 6 shared, 1 of them hot
        # -> common counted = 5, union = 7 + 7 - 5 = 9
        assert row["jaccard"] == round(5 / 9, 4)

    def test_default_cap_is_bounded(self, spark):
        """The default path (no explicit max_df) must have a finite cap so a
        pathological shingle cannot go quadratic."""
        import inspect

        sig = inspect.signature(dedup.ngram_jaccard_pairs)
        assert sig.parameters["max_df"].default is not None
