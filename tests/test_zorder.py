"""Z-order compaction (lake/zorder.py): Morton interleave math, quantile-rank
locality, and the end-to-end claim — after a z-ordered rewrite, read(where=)
prunes files on predicates over EITHER z-ordered column, where a linear sort
only ever prunes on its leading column."""

import pytest
from pyspark.sql import functions as F

from table2qb_spark.cdc.streaming import create_stream_table
from table2qb_spark.cdc.verify import table_sha256
from table2qb_spark.lake.compact import compact
from table2qb_spark.lake.merge import merge_upsert
from table2qb_spark.lake.table import LakeTable
from table2qb_spark.lake.zorder import interleave_bits, zorder_value

SCHEMA = [("repo", "string"), ("path", "string"), ("x", "long"), ("y", "long")]
KEYS = ["repo", "path"]


def _morton(a: int, b: int, bits: int) -> int:
    z = 0
    for j in range(bits):
        z |= ((a >> j) & 1) << (2 * j)
        z |= ((b >> j) & 1) << (2 * j + 1)
    return z


class TestInterleave:
    def test_matches_reference_morton(self, spark):
        rows = [(a, b) for a in range(8) for b in range(8)]
        df = spark.createDataFrame(rows, "a int, b int")
        got = {
            (r["a"], r["b"]): r["z"]
            for r in df.select(
                "a", "b",
                interleave_bits([F.col("a"), F.col("b")], 3).alias("z"),
            ).collect()
        }
        for a, b in rows:
            assert got[(a, b)] == _morton(a, b, 3)

    def test_bit_budget_enforced(self, spark):
        df = spark.createDataFrame([(1, 2, 3)], "a int, b int, c int")
        with pytest.raises(ValueError, match="z-bits"):
            zorder_value(df, ["a", "b", "c"], bits_per_col=16)

    def test_unknown_column_rejected(self, spark):
        df = spark.createDataFrame([(1,)], "a int")
        with pytest.raises(ValueError, match="not in DataFrame"):
            zorder_value(df, ["nope"])


class TestZValueRanks:
    def test_quantile_ranks_spread_skewed_data(self, spark):
        # 90% of rows share x=0 (heavy skew); y uniform. Linear min/max
        # scaling would give x-rank 0 to almost everything AND y-ranks
        # intact — fine; the real risk is a skewed HIGH value compressing
        # the rest. Quantile ranks keep y fully spread regardless of x.
        rows = [(0 if i % 10 else 10**9, i) for i in range(1000)]
        df = spark.createDataFrame(rows, "x long, y long")
        z = df.select(zorder_value(df, ["x", "y"], bits_per_col=4).alias("z"))
        # 16 rank buckets on y alone would give >= 8 distinct z values even
        # with x degenerate
        assert z.distinct().count() >= 8

    def test_string_column_order_preserved(self, spark):
        df = spark.createDataFrame(
            [("apple",), ("banana",), ("cherry",), ("zebra",)], "s string"
        )
        out = df.select(
            "s", zorder_value(df, ["s"], bits_per_col=4).alias("z")
        ).collect()
        by_s = sorted(out, key=lambda r: r["s"])
        zs = [r["z"] for r in by_s]
        assert zs == sorted(zs)  # lexicographic order survives the surrogate


def test_zorder_compaction_prunes_on_both_columns(spark, tmp_path):
    """The headline: a z-ordered rewrite lets the manifest stats prune files
    for range predicates on EITHER column; the same data linearly sorted by
    x prunes only on x."""
    # 1024 rows over a full 32x32 (x, y) grid, one key each — x and y
    # INDEPENDENT (not two functions of the same residue, which would let a
    # linear x-sort accidentally cluster y too)
    rows = [
        (i + 1, "I", "r", f"f{i}.py", i % 32, i // 32) for i in range(1024)
    ]

    def mk(name):
        t = create_stream_table(spark, str(tmp_path / name), SCHEMA, KEYS, n_buckets=1)
        df = spark.createDataFrame(
            rows, "seq long, op string, repo string, path string, x long, y long"
        )
        merge_upsert(t, df, "b1", batch_size_hint=1)
        return t

    tz = mk("tz")
    sha_before = table_sha256(tz.read())
    res = compact(tz, zorder=["x", "y"], max_records_per_file=64, zorder_bits=5)
    assert not res["skipped"]
    assert res["files_after"] >= 8
    assert table_sha256(tz.read()) == sha_before  # state preserved exactly
    assert tz.snapshot().summary.get("zorder") == ["x", "y"]
    # the ephemeral __z sort key never lands in the files
    assert "__z" not in tz.read().columns

    tl = mk("tl")
    compact(tl, sort_by=["x"], max_records_per_file=64)

    def kept(t, where):
        rep = {}
        df = t.read(where=where, prune_report=rep)
        return rep["files_kept"], rep["files_total"], df

    # x-predicate: both layouts prune
    zx_kept, zx_total, zx_df = kept(tz, "x<4")
    lx_kept, lx_total, _ = kept(tl, "x<4")
    assert zx_kept < zx_total and lx_kept < lx_total

    # y-predicate: ONLY the z-ordered layout prunes; linear sort by x
    # leaves y scattered so every file's y-range spans the domain
    zy_kept, zy_total, zy_df = kept(tz, "y<4")
    ly_kept, ly_total, _ = kept(tl, "y<4")
    assert zy_kept < zy_total, "z-order must prune on the second column"
    assert ly_kept == ly_total, "linear sort cannot prune on the second column"

    # pruning is an optimization, never a correctness input
    assert zx_df.count() == sum(1 for r in rows if r[4] < 4)
    assert zy_df.count() == sum(1 for r in rows if r[5] < 4)


def test_zorder_sortby_mutually_exclusive(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, n_buckets=1)
    with pytest.raises(ValueError, match="mutually exclusive"):
        compact(t, sort_by=["x"], zorder=["y"])


def test_zorder_unknown_column_rejected(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, n_buckets=1)
    with pytest.raises(ValueError, match="not in table"):
        compact(t, zorder=["nope"])
