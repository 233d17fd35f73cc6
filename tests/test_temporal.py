"""Temporal CDC operators: as-of join (cdc/asof.py), SCD Type-2 history
(cdc/history.py), and the hierarchical time rollup (ops/rollup.py) — value
semantics on handcrafted logs plus the plan shapes the 100 TB story rests
on (one shuffle, no range-join explosion, no Expand)."""

import pytest
from pyspark.sql import functions as F

from table2qb_spark.cdc.asof import asof_join
from table2qb_spark.cdc.history import scd2_history
from table2qb_spark.ops.rollup import time_rollup


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestAsofJoin:
    @pytest.fixture()
    def sides(self, spark):
        right = spark.createDataFrame(
            [
                ("a", 100, "v1"),
                ("a", 200, "v2"),
                ("a", 400, "v3"),
                ("b", 150, "w1"),
            ],
            "k string, ts long, val string",
        )
        left = spark.createDataFrame(
            [
                ("a", 50, 1),    # before any version -> null
                ("a", 100, 2),   # exactly simultaneous -> v1 (closed bound)
                ("a", 250, 3),   # between v2 and v3 -> v2
                ("a", 9000, 4),  # far after v3 -> v3 (or null w/ tolerance)
                ("b", 160, 5),   # -> w1
                ("c", 500, 6),   # key never versioned -> null
            ],
            "k string, ts long, probe_id int",
        )
        return left, right

    def test_backward_match_semantics(self, spark, sides):
        left, right = sides
        got = {
            r["probe_id"]: r["r_val"]
            for r in asof_join(left, right, ["k"], "ts", "ts").collect()
        }
        assert got == {1: None, 2: "v1", 3: "v2", 4: "v3", 5: "w1", 6: None}

    def test_tolerance_nulls_stale_matches(self, spark, sides):
        left, right = sides
        out = asof_join(left, right, ["k"], "ts", "ts", tolerance_ms=1000)
        got = {r["probe_id"]: (r["r_ts"], r["r_val"]) for r in out.collect()}
        assert got[4] == (None, None)  # 9000 - 400 > 1000: too stale
        assert got[3] == (200, "v2")
        assert got[2] == (100, "v1")

    def test_left_rows_and_columns_preserved(self, spark, sides):
        left, right = sides
        out = asof_join(left, right, ["k"], "ts", "ts")
        assert out.columns == ["k", "ts", "probe_id", "r_ts", "r_val"]
        assert out.count() == left.count()

    def test_single_shuffle_no_join(self, spark, sides):
        """The whole operator is union -> ONE hash exchange on the key ->
        window. Any join node means the range-join formulation snuck back."""
        left, right = sides
        plan = _plan(asof_join(left, right, ["k"], "ts", "ts"))
        assert plan.count("Exchange hashpartitioning") == 1, plan
        for bad in ("CartesianProduct", "BroadcastNestedLoopJoin",
                    "SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"):
            assert bad not in plan, plan


class TestScd2History:
    @pytest.fixture()
    def log(self, spark):
        return spark.createDataFrame(
            [
                (1, 10, "I", "a0"),
                (1, 20, "U", "a1"),
                (1, 30, "D", None),   # closes a1, opens nothing
                (1, 40, "I", "a2"),   # re-insert after delete
                (2, 15, "I", "b0"),   # still current
                (3, 11, "I", "c0"),
                (3, 12, "D", None),   # key fully deleted
            ],
            "k int, seq long, op string, val string",
        )

    def test_intervals_and_current_flags(self, spark, log):
        rows = {
            (r["k"], r["valid_from_seq"]): (
                r["valid_to_seq"], r["is_current"], r["val"])
            for r in scd2_history(log, ["k"], "seq", "op").collect()
        }
        assert rows == {
            (1, 10): (20, False, "a0"),
            (1, 20): (30, False, "a1"),   # closed BY the delete
            (1, 40): (None, True, "a2"),
            (2, 15): (None, True, "b0"),
            (3, 11): (12, False, "c0"),   # deleted key: no current version
        }

    def test_redelivered_duplicates_collapse(self, spark, log):
        """At-least-once redelivery of the same (key, seq) must not create
        zero-width or duplicate versions."""
        dup = log.unionByName(log.where(F.col("seq").isin(10, 15)))
        base = sorted(map(tuple, scd2_history(log, ["k"], "seq", "op").collect()))
        redeliv = sorted(map(tuple, scd2_history(dup, ["k"], "seq", "op").collect()))
        assert base == redeliv

    def test_single_shuffle(self, spark, log):
        plan = _plan(scd2_history(log, ["k"], "seq", "op"))
        assert plan.count("Exchange hashpartitioning") == 1, plan
        assert "Join" not in plan, plan


class TestTimeRollup:
    def test_levels_reaggregate_exactly(self, spark):
        df = spark.createDataFrame(
            [
                ("2024-01-01 00:10:00", 1.0),
                ("2024-01-01 00:50:00", 2.0),
                ("2024-01-01 05:00:00", 4.0),
                ("2024-01-02 00:00:00", 8.0),
            ],
            "ts string, value double",
        ).select(F.col("ts").cast("timestamp").alias("ts"), "value")
        rows = {
            (r["d"], r["h"], r["lvl"]): (r["n_events"], r["sum_value"])
            for r in time_rollup(df).collect()
        }
        assert rows == {
            ("2024-01-01", 0, 0): (2, 3.0),
            ("2024-01-01", 5, 0): (1, 4.0),
            ("2024-01-02", 0, 0): (1, 8.0),
            ("2024-01-01", None, 1): (3, 7.0),
            ("2024-01-02", None, 1): (1, 8.0),
            (None, None, 3): (4, 15.0),
        }

    def test_no_expand_in_plan(self, spark):
        """The hierarchical formulation must never Expand the scan; the
        coarser grains re-aggregate the finest grain's output."""
        df = spark.range(10).select(
            F.timestamp_seconds(F.col("id") * 3600).alias("ts"),
            F.col("id").cast("double").alias("value"),
        )
        plan = _plan(time_rollup(df))
        assert "Expand" not in plan, plan


class TestRowLineage:
    @pytest.fixture()
    def log(self, spark):
        # key 1: insert, two updates           -> live, created 10, 3 versions
        # key 2: insert, delete                -> gone
        # key 3: insert, delete, re-insert, up -> live, NEW incarnation at 40
        # key 4: update only (upstream insert pre-dates the log) -> live
        # key 5: redelivered duplicate event   -> collapses in n_versions
        return spark.createDataFrame(
            [
                (1, 10, "I"), (1, 20, "U"), (1, 30, "U"),
                (2, 10, "I"), (2, 20, "D"),
                (3, 10, "I"), (3, 20, "D"), (3, 40, "I"), (3, 50, "U"),
                (4, 15, "U"),
                (5, 10, "I"), (5, 10, "I"),
            ],
            "k long, seq long, op string",
        )

    def test_incarnation_semantics(self, spark, log):
        from table2qb_spark.cdc.history import row_lineage

        rows = {r["k"]: r for r in row_lineage(log, ["k"]).collect()}
        assert set(rows) == {1, 3, 4, 5}  # key 2 deleted -> absent
        assert (rows[1]["created_seq"], rows[1]["last_updated_seq"],
                rows[1]["n_versions"]) == (10, 30, 3)
        # delete + re-insert: lineage restarts at the re-insert
        assert (rows[3]["created_seq"], rows[3]["last_updated_seq"],
                rows[3]["n_versions"]) == (40, 50, 2)
        assert (rows[4]["created_seq"], rows[4]["n_versions"]) == (15, 1)
        # redelivery is invisible: distinct-seq count
        assert rows[5]["n_versions"] == 1

    def test_row_id_stable_across_updates_fresh_after_reinsert(self, spark, log):
        from table2qb_spark.cdc.history import row_lineage

        full = {r["k"]: r["row_id"] for r in row_lineage(log, ["k"]).collect()}
        # drop key 1's later updates: same incarnation -> same row_id
        trimmed = log.where(~((F.col("k") == 1) & (F.col("seq") > 10)))
        part = {r["k"]: r["row_id"] for r in row_lineage(trimmed, ["k"]).collect()}
        assert part[1] == full[1]
        # key 3 before its delete: different incarnation -> different row_id
        early = log.where(~((F.col("k") == 3) & (F.col("seq") > 10)))
        pre = {r["k"]: r["row_id"] for r in row_lineage(early, ["k"]).collect()}
        assert pre[3] != full[3]

    def test_single_exchange(self, spark, log):
        from table2qb_spark.cdc.history import row_lineage

        plan = _plan(row_lineage(log, ["k"]))
        # window max-delete + groupBy reuse ONE hash partitioning on the key
        assert plan.count("Exchange hashpartitioning") == 1, plan
