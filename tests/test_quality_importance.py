"""Data-quality surface (lake/quality.py), DSIR importance resampling
(ops/importance.py) and quality-aware dedup keeper (ops/dedup.py)."""

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from table2qb_spark.lake.quality import check_constraints, profile_columns
from table2qb_spark.ops.dedup import exact_dedup_keep_best
from table2qb_spark.ops.importance import (
    importance_resample,
    importance_weights,
    ngram_features_expr,
)


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [
            Row(pid=1, name="ada", age=36, city="london"),
            Row(pid=2, name="bob", age=None, city="paris"),
            Row(pid=3, name="cli", age=41, city="london"),
            Row(pid=4, name=None, age=41, city=None),
            Row(pid=5, name="eve", age=7, city="oslo"),
        ]
    )


class TestProfile:
    def test_profile_all_columns(self, people):
        rows = {r["column_name"]: r for r in profile_columns(people, exact_distinct=True).collect()}
        assert set(rows) == {"pid", "name", "age", "city"}
        assert all(r["n_rows"] == 5 for r in rows.values())
        assert rows["age"]["n_null"] == 1
        assert rows["age"]["null_frac"] == 0.2
        assert rows["age"]["n_distinct"] == 3  # 36, 41, 7
        assert rows["age"]["min_value"] == "7"
        assert rows["age"]["max_value"] == "41"
        assert rows["name"]["min_value"] == "ada"
        assert rows["name"]["max_value"] == "eve"
        assert rows["pid"]["n_null"] == 0 and rows["pid"]["n_distinct"] == 5

    def test_profile_approx_default_close(self, people):
        # HLL at this cardinality is exact in practice; the contract is
        # "approximate", so assert a tolerant band
        rows = {r["column_name"]: r for r in profile_columns(people, ["city"]).collect()}
        assert abs(rows["city"]["n_distinct"] - 3) <= 1

    def test_profile_missing_column_raises(self, people):
        with pytest.raises(ValueError, match="no such column"):
            profile_columns(people, ["nope"])

    def test_profile_single_scan_plan(self, people):
        # the exact=False profile must be ONE aggregate over ONE scan — no
        # Expand (multi-distinct) node, no per-column subplans
        plan = profile_columns(people)._jdf.queryExecution().executedPlan().toString()
        assert "Expand" not in plan
        assert plan.count("Scan ExistingRDD") <= 1


class TestCheckConstraints:
    def test_all_rule_kinds(self, people):
        res = {
            r["rule"]: r
            for r in check_constraints(
                people,
                [
                    "not_null:name",
                    "unique:pid",
                    "unique:age",
                    "accepted:city:london|paris|oslo",
                    "check:age >= 18",
                ],
            ).collect()
        }
        assert res["not_null:name"]["violations"] == 1
        assert not res["not_null:name"]["passed"]
        assert res["unique:pid"]["violations"] == 0 and res["unique:pid"]["passed"]
        # two rows share age=41 -> 1 excess copy
        assert res["unique:age"]["violations"] == 1
        assert res["accepted:city:london|paris|oslo"]["violations"] == 0
        # NULL age counts as a violation (unknown is not proof), plus eve
        assert res["check:age >= 18"]["violations"] == 2

    def test_accepted_flags_outsiders_not_nulls(self, people):
        res = check_constraints(people, ["accepted:city:london"]).collect()[0]
        # paris + oslo violate; the NULL city does not (that's not_null's job)
        assert res["violations"] == 2

    def test_bad_rule_raises(self, people):
        with pytest.raises(ValueError, match="bad rule"):
            check_constraints(people, ["frobnicate:name"]).collect()
        with pytest.raises(ValueError, match="no rules"):
            check_constraints(people, [])


class TestQualityCLI:
    def _lake(self, spark, tmp_path):
        from table2qb_spark.lake.merge import merge_upsert
        from table2qb_spark.lake.table import LakeTable

        t = LakeTable.create(
            spark, str(tmp_path / "t"),
            [("repo", "string"), ("path", "string"), ("n", "int")],
            ["repo", "path"], n_buckets=2,
        )
        ev = spark.createDataFrame(
            [Row(op="U", seq=i, repo="r", path=f"p{i}", n=i) for i in range(4)]
        )
        merge_upsert(t, ev, "c1")
        return t

    def test_profile_and_check_cli(self, spark, tmp_path, capsys):
        from table2qb_spark.main import main

        t = self._lake(spark, tmp_path)
        assert main(["cdc-profile", "--table", t.path, "--columns", "repo,n",
                     "--exact"]) == 0
        prof = {r["column_name"]: r for r in json.loads(capsys.readouterr().out)}
        assert prof["n"]["n_rows"] == 4 and prof["n"]["n_distinct"] == 4

        assert main(["cdc-check", "--table", t.path,
                     "--rule", "not_null:repo", "--rule", "unique:repo,path"]) == 0
        capsys.readouterr()  # drain the passing run's JSON
        # failing rule -> exit 1 (the WAP gate contract)
        assert main(["cdc-check", "--table", t.path, "--rule", "check:n < 3"]) == 1
        out = json.loads(capsys.readouterr().out)
        assert out[0]["violations"] == 1 and not out[0]["passed"]


class TestKeepBest:
    def test_keeper_is_best_scoring_min_id_on_tie(self, spark):
        df = spark.createDataFrame(
            [
                Row(doc_id=1, text="aaa", score=0.5),
                Row(doc_id=2, text="aaa", score=0.9),   # winner: best score
                Row(doc_id=3, text="aaa", score=0.9),   # tie -> min id wins
                Row(doc_id=4, text="bbb", score=0.1),
            ]
        )
        out = {r["content_hash"]: r for r in
               exact_dedup_keep_best(df, score_col="score").collect()}
        groups = {r["n_copies"]: r for r in out.values()}
        assert groups[3]["keeper_id"] == 2
        assert groups[3]["keeper_score"] == 0.9
        assert groups[1]["keeper_id"] == 4

    def test_rounding_guards_float_noise(self, spark):
        # scores differing below 1e-6 are a TIE -> min id, not float luck
        df = spark.createDataFrame(
            [
                Row(doc_id=7, text="x", score=0.1 + 2e-9),
                Row(doc_id=5, text="x", score=0.1),
            ]
        )
        r = exact_dedup_keep_best(df, score_col="score").collect()[0]
        assert r["keeper_id"] == 5

    def test_single_aggregate_plan(self, spark):
        df = spark.createDataFrame([Row(doc_id=1, text="a", score=1.0)])
        plan = exact_dedup_keep_best(df, score_col="score")._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert plan.count("Exchange") == 1


class TestImportance:
    @pytest.fixture(scope="class")
    def corpora(self, spark):
        raw = spark.createDataFrame(
            [
                Row(doc_id=1, text="the cat sat on the mat"),
                Row(doc_id=2, text="the dog sat on the log"),
                Row(doc_id=3, text="import numpy as np and run"),
                Row(doc_id=4, text="def main print hello world"),
                Row(doc_id=5, text="the cat and the dog play"),
                Row(doc_id=6, text=""),
            ]
        )
        target = raw.where(F.col("doc_id").isin(3, 4))  # code-like target
        return raw, target

    def test_ngram_features(self, spark):
        row = spark.range(1).select(
            ngram_features_expr(F.lit("The quick brown")).alias("f")
        ).collect()[0]
        assert row["f"] == ["the", "quick", "brown", "the quick", "quick brown"]
        empty = spark.range(1).select(
            ngram_features_expr(F.lit("")).alias("f")
        ).collect()[0]
        assert empty["f"] == []

    def test_weights_rank_target_like_docs_higher(self, corpora):
        raw, target = corpora
        w = {r["doc_id"]: r for r in
             importance_weights(raw, target, n_buckets=128).collect()}
        assert 6 not in w  # zero-token doc has no features
        # target members score above every prose doc
        prose_max = max(w[i]["log_weight"] for i in (1, 2, 5))
        assert min(w[3]["log_weight"], w[4]["log_weight"]) > prose_max
        assert w[1]["n_feats"] == 11  # 6 unigrams + 5 bigrams

    def test_resample_is_deterministic_topk(self, corpora):
        raw, target = corpora
        a = importance_resample(raw, target, k=3, n_buckets=128, seed=9).collect()
        b = importance_resample(raw, target, k=3, n_buckets=128, seed=9).collect()
        assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
        assert len(a) == 3
        # a different seed may reorder (Gumbel noise changes)
        c = importance_resample(raw, target, k=5, n_buckets=128, seed=9).collect()
        assert {r["doc_id"] for r in a} <= {r["doc_id"] for r in c}

    def test_ratio_join_is_broadcast(self, corpora):
        raw, target = corpora
        plan = importance_weights(raw, target, n_buckets=64)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
