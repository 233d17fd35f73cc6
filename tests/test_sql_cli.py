"""cdc-sql (lake/sql.py + main.py): ad-hoc Spark SQL over lake tables as
temp views — spec parsing, registration, time travel via @REF, metadata
views, cross-table joins, file-skipping --where, CLI output modes."""

import json

import pytest
from pyspark.sql import functions as F

from table2qb_spark.lake.sql import (
    parse_table_spec,
    register_lake_views,
)
from table2qb_spark.lake.table import LakeTable, key_bucket_expr

SCHEMA = [
    ("repo", "string"),
    ("path", "string"),
    ("lang", "string"),
    ("stars", "long"),
]
KEYS = ["repo", "path"]
N = 200


def _rows(spark, n=N, stars_mult=3):
    return spark.range(n).select(
        F.concat(F.lit("r"), (F.col("id") % 5).cast("string")).alias("repo"),
        F.concat(F.lit("f"), F.col("id").cast("string")).alias("path"),
        F.when(F.col("id") % 4 == 0, "php").otherwise("py").alias("lang"),
        (F.col("id") * stars_mult).alias("stars"),
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, n_buckets=4)
    df = _rows(spark).withColumn("__bucket", key_bucket_expr(KEYS, 4))
    files = t.write_data_files(df, "c1")
    t.commit_files("c1", list(files), files)
    # second snapshot: stars doubled for one repo (gives time travel a
    # visible difference)
    df2 = (
        _rows(spark, stars_mult=6)
        .where(F.col("repo") == "r0")
        .withColumn("__bucket", key_bucket_expr(KEYS, 4))
    )
    from table2qb_spark.lake.dml import merge_into

    merge_into(t, df2.drop("__bucket"), "c2", when_matched_update="*")
    return t


class TestSpecParsing:
    def test_plain(self):
        assert parse_table_spec("t=/data/lake") == ("t", "/data/lake", None)

    def test_with_ref(self):
        assert parse_table_spec("t=/data/lake@3") == ("t", "/data/lake", "3")
        assert parse_table_spec("t=/d/l@corpus-v3") == ("t", "/d/l", "corpus-v3")

    def test_at_in_path_not_a_ref(self):
        # a path segment containing @ must not be eaten as a ref
        assert parse_table_spec("t=/data/x@y/lake") == ("t", "/data/x@y/lake", None)

    def test_bad_specs(self):
        for bad in ("nodir", "=path", "t=", "1bad=/x", "a-b=/x"):
            with pytest.raises(ValueError):
                parse_table_spec(bad)


class TestRegistration:
    def test_data_and_metadata_views(self, spark, table):
        views = register_lake_views(spark, [f"t={table.path}"])
        assert set(views) == {
            "t", "t_files", "t_snapshots", "t_refs", "t_properties"
        }
        assert spark.sql("SELECT count(*) c FROM t").collect()[0]["c"] == N
        snaps = spark.sql(
            "SELECT count(*) c FROM t_snapshots"
        ).collect()[0]["c"]
        assert snaps == 3  # create(empty)=1, c1=2, merge=3
        assert spark.sql("SELECT count(*) c FROM t_files").collect()[0]["c"] > 0

    def test_time_travel_ref(self, spark, table):
        register_lake_views(spark, [f"old={table.path}@2", f"new={table.path}"])
        # snapshot 2 predates the merge: r0 stars unchanged
        q = ("SELECT sum(stars) s FROM {v} WHERE repo = 'r0'")
        old = spark.sql(q.format(v="old")).collect()[0]["s"]
        new = spark.sql(q.format(v="new")).collect()[0]["s"]
        assert new == 2 * old

    def test_tag_ref(self, spark, table):
        table.create_tag("before-merge", snapshot_id=2)
        register_lake_views(spark, [f"b={table.path}@before-merge"])
        s = spark.sql(
            "SELECT sum(stars) s FROM b WHERE repo = 'r0'"
        ).collect()[0]["s"]
        assert s == sum(i * 3 for i in range(N) if i % 5 == 0)

    def test_join_across_registrations(self, spark, table):
        register_lake_views(spark, [f"a={table.path}@2", f"b={table.path}"])
        drift = spark.sql(
            "SELECT count(*) c FROM a JOIN b USING (repo, path) "
            "WHERE a.stars <> b.stars"
        ).collect()[0]["c"]
        assert drift == sum(1 for i in range(N) if i % 5 == 0 and i > 0)

    def test_where_prunes_files(self, spark, table):
        register_lake_views(
            spark, [f"t={table.path}"], where={"t": "repo=r1"}
        )
        got = spark.sql("SELECT count(*) c FROM t WHERE repo='r1'")
        assert got.collect()[0]["c"] == sum(1 for i in range(N) if i % 5 == 1)

    def test_errors(self, spark, table):
        with pytest.raises(ValueError, match="duplicate view"):
            register_lake_views(
                spark, [f"t={table.path}", f"t={table.path}"]
            )
        with pytest.raises(ValueError, match="no lake table"):
            register_lake_views(spark, ["t=/nonexistent/lake"])
        with pytest.raises(ValueError, match="unknown table"):
            register_lake_views(
                spark, [f"t={table.path}"], where={"zzz": "repo=r1"}
            )


class TestCli:
    def _main(self, argv):
        from table2qb_spark.main import main

        return main(argv)

    def test_rows_to_stdout(self, table, capsys):
        rc = self._main([
            "cdc-sql", "--table", f"t={table.path}",
            "--query",
            "SELECT lang, count(*) AS n FROM t GROUP BY lang ORDER BY lang",
        ])
        assert rc == 0
        out = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
        assert out == [
            {"lang": "php", "n": N // 4},
            {"lang": "py", "n": N - N // 4},
        ]

    def test_limit_truncation_note(self, table, capsys):
        rc = self._main([
            "cdc-sql", "--table", f"t={table.path}",
            "--query", "SELECT path FROM t", "--limit", "5",
        ])
        assert rc == 0
        cap = capsys.readouterr()
        assert len(cap.out.splitlines()) == 5
        assert "truncated" in cap.err

    def test_output_parquet(self, table, tmp_path, capsys):
        out = str(tmp_path / "result")
        rc = self._main([
            "cdc-sql", "--table", f"t={table.path}",
            "--query", "SELECT repo, sum(stars) AS s FROM t GROUP BY repo",
            "--output", out,
        ])
        assert rc == 0
        rep = json.loads(capsys.readouterr().out)
        assert rep["rows"] == 5 and rep["format"] == "parquet"

    def test_explain_prints_plan(self, table, capsys):
        rc = self._main([
            "cdc-sql", "--table", f"t={table.path}",
            "--query", "SELECT count(*) FROM t", "--explain",
        ])
        assert rc == 0
        assert "Physical Plan" in capsys.readouterr().out

    def test_bad_query_is_user_error(self, table, capsys):
        rc = self._main([
            "cdc-sql", "--table", f"t={table.path}",
            "--query", "SELECT nope FROM t",
        ])
        assert rc == 1
        assert "error:" in capsys.readouterr().err

    def test_bad_where_spec(self, table, capsys):
        rc = self._main([
            "cdc-sql", "--table", f"t={table.path}",
            "--query", "SELECT 1", "--where", "nopred",
        ])
        assert rc == 1
        assert "name=PRED" in capsys.readouterr().err
