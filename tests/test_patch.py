"""Partial-update (patch) merge engine: semantics, equivalences, plan shape.

The engine folds MySQL-minimal-row-image / Mongo-$set style partial payloads
(null on U = "unchanged", null on I = real null) into final state with ONE
map-side-combinable aggregate — no window, no sort. These tests pin every
semantic branch, the salted twin, the base-merge composition, and the
one-shuffle physical plan."""

import pytest
from pyspark.sql import functions as F

from table2qb_spark.cdc.patch import patch_merge, patch_state

SCHEMA = "k int, seq long, op string, a int, b string"


def _state(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    out = patch_state(df, ["k"], **kw)
    return {r["k"]: (r["seq"], r["a"], r["b"]) for r in out.collect()}


class TestPatchSemantics:
    def test_patch_coalesces_per_column(self, spark):
        # U nulls leave the column untouched; non-nulls overwrite.
        st = _state(
            spark,
            [
                (1, 10, "I", 1, "x"),
                (1, 11, "U", None, "y"),  # patches b only
                (1, 12, "U", 5, None),  # patches a only
            ],
        )
        assert st == {1: (12, 5, "y")}

    def test_insert_null_is_authoritative(self, spark):
        # A full row image's null is a REAL null, not "unchanged".
        st = _state(spark, [(1, 10, "I", 7, "x"), (1, 11, "I", None, "z")])
        assert st == {1: (11, None, "z")}

    def test_delete_kills_key(self, spark):
        st = _state(spark, [(1, 10, "I", 1, "x"), (1, 11, "D", None, None)])
        assert st == {}

    def test_delete_then_patch_revives_onto_empty_row(self, spark):
        # Pre-delete values must NOT leak through the revival.
        st = _state(
            spark,
            [
                (1, 10, "I", 1, "x"),
                (1, 11, "D", None, None),
                (1, 12, "U", None, "y"),
            ],
        )
        assert st == {1: (12, None, "y")}

    def test_delete_then_insert_replaces_wholesale(self, spark):
        st = _state(
            spark,
            [
                (1, 10, "I", 1, "x"),
                (1, 11, "D", None, None),
                (1, 12, "I", 2, None),
                (1, 13, "U", None, "w"),
            ],
        )
        assert st == {1: (13, 2, "w")}

    def test_patch_only_key_upserts(self, spark):
        # A key first seen via U builds a row from nothing.
        st = _state(spark, [(1, 10, "U", None, "y"), (1, 11, "U", 3, None)])
        assert st == {1: (11, 3, "y")}

    def test_duplicate_delivery_is_idempotent(self, spark):
        rows = [(1, 10, "I", 1, "x"), (1, 11, "U", None, "y")]
        assert _state(spark, rows) == _state(spark, rows + rows)

    def test_two_phase_salted_twin_is_identical(self, spark):
        rows = [
            (k, s, op, a, b)
            for k in (1, 2, 3)
            for (s, op, a, b) in [
                (10, "I", k, "x"),
                (11, "U", None, "y"),
                (12, "U", k * 10, None),
                (13, "D", None, None) if k == 2 else (13, "U", None, "z"),
            ]
        ]
        assert _state(spark, rows) == _state(spark, rows, two_phase=True)


class TestPatchMerge:
    def test_half_fold_plus_merge_equals_one_shot(self, spark):
        rows = [
            (1, 10, "I", 1, "x"),
            (1, 11, "U", None, "y"),
            (2, 12, "I", 2, "p"),
            (1, 13, "U", 9, None),
            (2, 14, "D", None, None),
            (3, 15, "U", 4, None),
            (2, 16, "U", None, "revived"),
        ]
        df = spark.createDataFrame(rows, SCHEMA)
        one_shot = {
            r["k"]: (r["seq"], r["a"], r["b"])
            for r in patch_state(df, ["k"]).collect()
        }
        base = patch_state(df.where(F.col("seq") <= 13), ["k"])
        merged = patch_merge(base, df.where(F.col("seq") > 13), ["k"])
        got = {r["k"]: (r["seq"], r["a"], r["b"]) for r in merged.collect()}
        assert got == one_shot
        # The scenario genuinely exercises revival-after-delete across the
        # split: key 2 dies in the base, revives in the second half.
        assert got[2] == (16, None, "revived")


class TestPatchPlanShape:
    def test_single_shuffle_no_window_no_python(self, spark):
        df = spark.createDataFrame(
            [(1, 10, "I", 1, "x"), (1, 11, "U", None, "y")], SCHEMA
        )
        plan = (
            patch_state(df, ["k"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange hashpartitioning") == 1, plan
        # No window fold, no Python in the data plane. (max(struct) compiles
        # to SortAggregate — a per-partition key sort, same accepted shape
        # as dedup_max_seq — so a local Sort IS expected.)
        for bad in ("Window", "BatchEvalPython", "ArrowEvalPython"):
            assert bad not in plan, plan
        # Map-side combine: a partial_max must run below the exchange.
        assert "partial_max" in plan, plan
