"""Incremental materialized views (lake/materialize.py + cdc-materialize).

Load-bearing property — INCREMENTAL == RECOMPUTE: after any sequence of
source commits (inserts, updates that move rows between groups, deletes
that kill groups), a refresh driven purely by the envelope delta must
leave the view equal to a from-scratch groupBy of the source. Plus:
exactly-once refresh (re-run is a marker skip), cursor atomicity (rides
in the refresh commit), group death (__n hits 0 -> row deleted), expired
cursor -> loud error -> --full-refresh recovers.
"""
import json

from pyspark.sql import functions as F

from table2qb_spark.lake.materialize import (
    create_view,
    full_aggregate,
    parse_aggs,
    refresh_view,
)
from table2qb_spark.lake.merge import merge_upsert
from table2qb_spark.lake.table import LakeTable
from table2qb_spark.main import main
from tests.test_rollback import batch_df, make_table

import pytest

AGGS = ["docs=count(*)", "bytes=sum(length(content))"]


def _expected(src, group=("lang",)):
    aggs = parse_aggs(AGGS)
    return {
        tuple(r[g] for g in group) + (r["__n"], r["docs"], r["bytes"])
        for r in full_aggregate(src.read(), list(group), aggs).collect()
    }


def _actual(view, group=("lang",)):
    return {
        tuple(r[g] for g in group) + (r["__n"], r["docs"], r["bytes"])
        for r in view.read().collect()
    }


def _seed(spark, tmp_path):
    t = make_table(spark, tmp_path)
    merge_upsert(t, batch_df(spark, [
        (1, "I", "r1", "a.py", "c1", "py", "hello"),
        (2, "I", "r1", "b.py", "c2", "py", "world!!"),
        (3, "I", "r2", "m.go", "c3", "go", "gopher"),
    ]), "b1")
    return t


class TestMaterialize:
    def test_bootstrap_equals_recompute(self, spark, tmp_path):
        t = _seed(spark, tmp_path)
        vp = str(tmp_path / "mv")
        r = create_view(spark, t.path, vp, ["lang"], AGGS)
        assert r["bootstrap"] and r["groups"] == 2
        v = LakeTable(spark, vp)
        assert _actual(v) == _expected(t)

    def test_incremental_equals_recompute(self, spark, tmp_path):
        t = _seed(spark, tmp_path)
        vp = str(tmp_path / "mv")
        create_view(spark, t.path, vp, ["lang"], AGGS)
        v = LakeTable(spark, vp)
        # inserts, an update that changes sum, an update that MOVES a row
        # between groups, and a delete
        merge_upsert(t, batch_df(spark, [
            (4, "I", "r3", "x.rs", "c4", "rs", "ferris"),
            (5, "U", "r1", "a.py", "c5", "py", "hello longer now"),
            (6, "U", "r2", "m.go", "c6", "py", "was-go-now-py"),
            (7, "D", "r1", "b.py", None, None, None),
        ]), "b2")
        r = refresh_view(spark, vp)
        assert not r["skipped"] and r["cursor"] == t.current_snapshot_id()
        assert _actual(v) == _expected(t)
        # group 'go' died (its only row moved to py)
        assert v.read().where("lang = 'go'").count() == 0

    def test_refresh_is_exactly_once_and_idempotent(self, spark, tmp_path):
        t = _seed(spark, tmp_path)
        vp = str(tmp_path / "mv")
        create_view(spark, t.path, vp, ["lang"], AGGS)
        merge_upsert(t, batch_df(spark, [
            (4, "I", "r3", "x.rs", "c4", "rs", "ferris"),
        ]), "b2")
        r1 = refresh_view(spark, vp)
        assert not r1["skipped"]
        # nothing new: up-to-date short-circuit
        r2 = refresh_view(spark, vp)
        assert r2.get("up_to_date")
        # crash simulation: the same (from, to) envelope re-applied is a
        # commit-marker skip, not a double count
        v = LakeTable(spark, vp)
        assert v.has_commit(f"mv-refresh-{r1['from']}-{r1['cursor']}")
        assert _actual(v) == _expected(t)

    def test_multi_column_group(self, spark, tmp_path):
        t = _seed(spark, tmp_path)
        vp = str(tmp_path / "mv")
        create_view(spark, t.path, vp, ["repo", "lang"], AGGS)
        merge_upsert(t, batch_df(spark, [
            (4, "I", "r2", "n.go", "c4", "go", "more"),
            (5, "D", "r1", "a.py", None, None, None),
        ]), "b2")
        refresh_view(spark, vp)
        v = LakeTable(spark, vp)
        assert _actual(v, ("repo", "lang")) == _expected(t, ("repo", "lang"))

    def test_expired_cursor_then_full_refresh(self, spark, tmp_path):
        import os

        from table2qb_spark.lake.expire import expire_snapshots

        t = _seed(spark, tmp_path)
        vp = str(tmp_path / "mv")
        create_view(spark, t.path, vp, ["lang"], AGGS)
        merge_upsert(t, batch_df(spark, [
            (4, "I", "r3", "x.rs", "c4", "rs", "ferris"),
        ]), "b2")
        merge_upsert(t, batch_df(spark, [
            (5, "D", "r2", "m.go", None, None, None),
        ]), "b3")
        os.environ["SPARK_GRAFT_ORPHAN_GRACE_SEC"] = "0"
        try:
            expire_snapshots(t, keep_last=1)
        finally:
            del os.environ["SPARK_GRAFT_ORPHAN_GRACE_SEC"]
        with pytest.raises(ValueError, match="full-refresh"):
            refresh_view(spark, vp)
        r = refresh_view(spark, vp, full=True)
        assert r["full"]
        v = LakeTable(spark, vp)
        assert _actual(v) == _expected(t)
        assert v.read().where("lang = 'go'").count() == 0

    def test_parse_aggs_rejects_bad_specs(self):
        with pytest.raises(ValueError, match="expected"):
            parse_aggs(["n=min(x)"])
        with pytest.raises(ValueError, match="count supports only"):
            parse_aggs(["n=count(x)"])
        with pytest.raises(ValueError, match="duplicate/reserved"):
            parse_aggs(["n=count(*)", "n=count(*)"])
        with pytest.raises(ValueError, match="duplicate/reserved"):
            parse_aggs(["__n=count(*)"])

    def test_cli_create_then_refresh(self, spark, tmp_path, capsys):
        t = _seed(spark, tmp_path)
        vp = str(tmp_path / "mv")
        assert main(["cdc-materialize", "--view", vp, "--source", t.path,
                     "--group-by", "lang", "--agg", "docs=count(*)",
                     "--agg", "bytes=sum(length(content))"]) == 0
        out = json.loads(capsys.readouterr().out)
        assert out["bootstrap"] and out["groups"] == 2
        merge_upsert(t, batch_df(spark, [
            (4, "I", "r3", "x.rs", "c4", "rs", "ferris"),
        ]), "b2")
        # refresh needs only --view: config persisted in properties
        assert main(["cdc-materialize", "--view", vp]) == 0
        out = json.loads(capsys.readouterr().out)
        assert out["cursor"] == t.current_snapshot_id()
        v = LakeTable(spark, vp)
        assert _actual(v) == _expected(t)
        # the view is an ordinary lake table: time travel + cdc-sql work
        assert main(["cdc-sql", "--table", f"mv={vp}", "--query",
                     "SELECT count(*) AS n FROM mv"]) == 0
        assert json.loads(capsys.readouterr().out)["n"] == 3
