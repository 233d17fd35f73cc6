"""Row-level DML (lake/dml.py): predicate DELETE (copy-on-write and
position-delete strategies), predicate UPDATE, mask interplay with MOR
equality deletes, compaction folding, fsck arithmetic, time travel."""

import json
import os

import pytest
from pyspark.sql import functions as F

from table2qb_spark.lake.dml import delete_where, merge_into, update_where
from table2qb_spark.lake.fsck import fsck
from table2qb_spark.lake.table import LakeTable, key_bucket_expr

SCHEMA = [
    ("repo", "string"),
    ("path", "string"),
    ("lang", "string"),
    ("stars", "long"),
    ("content", "string"),
]
KEYS = ["repo", "path"]
N = 500
N_PHP = N // 5  # ids where id % 5 == 0


def _rows(spark, start=0, n=N):
    return spark.range(start, start + n).select(
        F.concat(F.lit("r"), (F.col("id") % 7).cast("string")).alias("repo"),
        F.concat(F.lit("f"), F.col("id").cast("string")).alias("path"),
        F.when(F.col("id") % 5 == 0, "php").otherwise("py").alias("lang"),
        (F.col("id") * 3).alias("stars"),
        F.concat(F.lit("c"), F.col("id").cast("string")).alias("content"),
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, KEYS, n_buckets=4)
    df = _rows(spark).withColumn("__bucket", key_bucket_expr(KEYS, 4))
    files = t.write_data_files(df, "c1")
    t.commit_files("c1", list(files), files)
    return t


class TestDeleteCOW:
    def test_simple_predicate(self, table):
        r = delete_where(table, "lang=php", "d1")
        assert r["strategy"] == "cow" and r["deleted_rows"] == N_PHP
        got = table.read()
        assert got.count() == N - N_PHP
        assert got.where(F.col("lang") == "php").count() == 0
        assert table.row_count() == N - N_PHP
        assert fsck(table, deep=True)["ok"]

    def test_sql_predicate(self, table):
        # quoted literal + function call: the SQL grammar, not the mini one
        r = delete_where(table, "lang = 'php' AND stars > 750", "d1")
        want = sum(1 for i in range(N) if i % 5 == 0 and i * 3 > 750)
        assert r["deleted_rows"] == want
        assert table.read().count() == N - want

    def test_idempotent_replay(self, table):
        delete_where(table, "lang=php", "d1")
        r2 = delete_where(table, "lang=php", "d1")
        assert r2.get("skipped")
        assert table.read().count() == N - N_PHP

    def test_no_match_no_commit(self, table):
        before = table.snapshot().snapshot_id
        r = delete_where(table, "lang=rust", "d-none")
        assert r["deleted_rows"] == 0
        assert table.snapshot().snapshot_id == before

    def test_time_travel_sees_predecessor(self, table):
        pre = table.snapshot().snapshot_id
        delete_where(table, "lang=php", "d1")
        assert table.read(snapshot_id=pre).count() == N


class TestDeletePositional:
    def test_masks_without_rewriting_data(self, table):
        pre_data = {
            e["path"] for b in table.snapshot().files
            for e in table.snapshot().files[b]
        }
        r = delete_where(table, "lang=php", "d1", strategy="positional")
        assert r["strategy"] == "positional" and r["deleted_rows"] == N_PHP
        snap = table.snapshot()
        post_data = {e["path"] for b in snap.files for e in snap.files[b]}
        assert post_data == pre_data  # no data file rewritten
        assert any(snap.pos_delete_files(b) for b in snap.files)
        got = table.read()
        assert got.count() == N - N_PHP
        assert got.where(F.col("lang") == "php").count() == 0
        assert table.row_count() == N - N_PHP
        assert fsck(table, deep=True)["ok"]

    def test_double_delete_is_noop(self, table):
        delete_where(table, "lang=php", "d1", strategy="positional")
        r2 = delete_where(table, "lang=php", "d2", strategy="positional")
        assert r2["deleted_rows"] == 0  # masked rows are no longer live
        assert table.read().count() == N - N_PHP
        assert fsck(table)["ok"]  # live-row arithmetic survives both

    def test_overlapping_predicates_accumulate(self, table):
        delete_where(table, "lang=php", "d1", strategy="positional")
        r = delete_where(table, "stars<30", "d2", strategy="positional")
        # ids 0..9: stars<30; of those, 0 and 5 are php (already dead)
        assert r["deleted_rows"] == 8
        assert table.read().count() == N - N_PHP - 8

    def test_compaction_folds_mask(self, table):
        from table2qb_spark.lake.compact import compact

        delete_where(table, "lang=php", "d1", strategy="positional")
        out = compact(table, min_files=1)
        assert not out.get("skipped")
        snap = table.snapshot()
        assert not any(snap.pos_delete_files(b) for b in snap.files)
        assert table.read().count() == N - N_PHP
        assert table.read().where(F.col("lang") == "php").count() == 0
        assert fsck(table, deep=True)["ok"]

    def test_debt_targeted_compaction_counts_pos_deletes(self, table):
        from table2qb_spark.lake.compact import compact

        delete_where(table, "lang=php", "d1", strategy="positional")
        out = compact(table, min_delete_ratio=0.05)
        assert not out.get("skipped")
        snap = table.snapshot()
        assert not any(snap.pos_delete_files(b) for b in snap.files)

    def test_interplay_with_equality_deletes(self, spark, tmp_path):
        """MOR equality deletes and position deletes mask independently."""
        from table2qb_spark.lake.mor import merge_mor

        t = LakeTable.create(
            spark, str(tmp_path / "m"),
            SCHEMA + [("_seq", "long")], KEYS, n_buckets=4,
        )
        ev = _rows(spark).select(
            "*",
            F.lit("I").alias("op"),
            (F.monotonically_increasing_id() + 1).alias("seq"),
        )
        merge_mor(t, ev, "m1")
        # MOR update: bump stars for f1 (equality-delete masks the old copy)
        upd = ev.where(F.col("path") == "f1").withColumn(
            "stars", F.lit(9999).cast("long")
        ).withColumn("seq", F.col("seq") + 10_000_000)
        merge_mor(t, upd, "m2")
        # positional delete of all php rows on top
        r = delete_where(t, "lang=php", "d1", strategy="positional")
        assert r["deleted_rows"] == N_PHP
        got = t.read()
        assert got.where(F.col("lang") == "php").count() == 0
        assert got.where(F.col("path") == "f1").collect()[0]["stars"] == 9999
        assert got.count() == N - N_PHP
        assert fsck(t, deep=True)["ok"]


class TestDeleteAuto:
    def test_narrow_delete_goes_positional(self, table):
        # one row out of 500 — far under the 10% default
        r = delete_where(table, "path = 'f3'", "d1", strategy="auto")
        assert r["strategy"] == "positional"
        assert r["deleted_rows"] == 1
        assert 0 < r["auto_matched_fraction"] < 0.10
        assert table.read().count() == N - 1

    def test_wide_delete_goes_cow(self, table):
        # lang=py is 80% of the table — COW rewrites, no mask debt
        r = delete_where(table, "lang=py", "d1", strategy="auto")
        assert r["strategy"] == "cow"
        assert r["deleted_rows"] == N - N_PHP
        assert r["auto_matched_fraction"] > 0.10
        assert table.read().count() == N_PHP
        # COW left no position-delete files behind
        assert fsck(table)["checked"]["pos_delete_files"] == 0

    def test_threshold_is_tunable(self, table):
        r = delete_where(
            table, "lang=php", "d1",
            strategy="auto", positional_max_fraction=0.5,
        )
        assert r["strategy"] == "positional"  # 20% <= 50%
        assert r["deleted_rows"] == N_PHP

    def test_auto_no_match_no_commit(self, table):
        before = table.snapshot().snapshot_id
        r = delete_where(table, "lang=rust", "d1", strategy="auto")
        assert r["deleted_rows"] == 0
        assert table.snapshot().snapshot_id == before

    def test_dry_run_resolves_without_committing(self, table):
        r = delete_where(table, "path = 'f3'", "d1", strategy="auto",
                         dry_run=True)
        assert r["dry_run"] and r["matched_rows"] == 1
        assert r["strategy"] == "positional"
        assert table.read().count() == N  # nothing happened
        # the commit_id was NOT consumed: the real statement still applies
        r2 = delete_where(table, "path = 'f3'", "d1")
        assert r2["deleted_rows"] == 1

    def test_update_dry_run(self, table):
        r = update_where(table, "lang=php", {"stars": "0"}, "u1",
                         dry_run=True)
        assert r["dry_run"] and r["matched_rows"] == N_PHP
        assert table.read().where(F.col("stars") == 0).count() <= 1


class TestUpdate:
    def test_update_simple(self, table):
        r = update_where(table, "lang=php", {"lang": "'hack'"}, "u1")
        assert r["updated_rows"] == N_PHP
        got = table.read()
        assert got.where(F.col("lang") == "hack").count() == N_PHP
        assert got.where(F.col("lang") == "php").count() == 0
        assert got.count() == N
        assert fsck(table, deep=True)["ok"]

    def test_update_expression_over_row(self, table):
        update_where(
            table, "stars >= 1200", {"stars": "stars * 2"}, "u1"
        )
        got = table.read().where(F.col("path") == "f450").collect()[0]
        assert got["stars"] == 450 * 3 * 2
        low = table.read().where(F.col("path") == "f10").collect()[0]
        assert low["stars"] == 30  # untouched rows carried verbatim

    def test_key_column_rejected(self, table):
        with pytest.raises(ValueError, match="key column"):
            update_where(table, "lang=php", {"repo": "'x'"}, "u1")

    def test_unknown_column_rejected(self, table):
        with pytest.raises(ValueError, match="Unknown column"):
            update_where(table, "lang=php", {"nope": "1"}, "u1")

    def test_idempotent_replay(self, table):
        update_where(table, "lang=php", {"stars": "stars + 1"}, "u1")
        r2 = update_where(table, "lang=php", {"stars": "stars + 1"}, "u1")
        assert r2.get("skipped")


class TestUpdateMOR:
    def test_mor_update_values_and_masks(self, table):
        r = update_where(
            table, "path = 'f3'", {"stars": "stars * 100"}, "u1",
            strategy="mor",
        )
        assert r["strategy"] == "mor" and r["updated_rows"] == 1
        got = table.read()
        assert got.count() == N  # old copy masked, new appended
        assert got.where(F.col("path") == "f3").collect()[0]["stars"] == 900
        assert fsck(table, deep=True)["ok"]

    def test_mor_appends_no_bucket_rewrite(self, table):
        """O(matched) shape: every pre-update data file survives verbatim;
        the commit only ADDS files (new rows + position deletes)."""
        pre = table.snapshot()
        pre_paths = {
            e["path"] for b in pre.files for e in pre.files[b]
        }
        update_where(table, "lang=php", {"stars": "0"}, "u1", strategy="mor")
        post = table.snapshot()
        post_paths = {
            e["path"] for b in post.files for e in post.files[b]
        }
        assert pre_paths <= post_paths
        checked = fsck(table)["checked"]
        assert checked["pos_delete_files"] > 0

    def test_mor_update_twice_masks_once_each(self, table):
        update_where(table, "path = 'f3'", {"stars": "stars + 1"}, "u1",
                     strategy="mor")
        update_where(table, "path = 'f3'", {"stars": "stars + 1"}, "u2",
                     strategy="mor")
        got = table.read()
        assert got.count() == N
        assert got.where(F.col("path") == "f3").collect()[0]["stars"] == 11
        assert fsck(table, deep=True)["ok"]

    def test_compact_folds_mor_update_debt(self, table):
        update_where(table, "lang=php", {"stars": "-1"}, "u1", strategy="mor")
        from table2qb_spark.lake.compact import compact

        out = compact(table)
        assert not out.get("skipped")
        # the CURRENT snapshot's mask is folded away (historical snapshots
        # keep theirs for time travel — fsck counts those too)
        snap = table.snapshot()
        assert not any(snap.pos_delete_files(b) for b in snap.files)
        assert fsck(table, deep=True)["ok"]
        got = table.read()
        assert got.count() == N
        assert got.where(F.col("stars") == -1).count() == N_PHP

    def test_mor_time_travel(self, table):
        pre = table.snapshot().snapshot_id
        update_where(table, "path = 'f3'", {"stars": "0"}, "u1",
                     strategy="mor")
        old = table.read(snapshot_id=pre).where(F.col("path") == "f3")
        assert old.collect()[0]["stars"] == 9


def _merge_source(spark):
    """44 source rows against the fixture's ids 0..499: ids 0,3,...,99
    match existing rows (34 matched, 7 of them php), ids 500..509 match
    nothing (the insert set)."""
    return spark.range(0, 510).where(
        ((F.col("id") % 3 == 0) & (F.col("id") < 100)) | (F.col("id") >= 500)
    ).select(
        F.concat(F.lit("r"), (F.col("id") % 7).cast("string")).alias("repo"),
        F.concat(F.lit("f"), F.col("id").cast("string")).alias("path"),
        F.lit("go").alias("lang"),
        (F.col("id") * 10).alias("stars"),
        F.lit("new").alias("content"),
    )


class TestMergeInto:
    # matched ids: 0,3,...,99 -> 34; php among them: id%15==0 -> 7
    N_MATCHED, N_PHP_MATCHED, N_INSERT = 34, 7, 10

    def test_three_clause_merge(self, table, spark):
        r = merge_into(
            table,
            _merge_source(spark),
            "m1",
            when_matched_update={"stars": "src_stars"},
            when_matched_delete="lang = 'php'",
            when_not_matched_insert=True,
        )
        assert r["deleted_rows"] == self.N_PHP_MATCHED
        assert r["updated_rows"] == self.N_MATCHED - self.N_PHP_MATCHED
        assert r["inserted_rows"] == self.N_INSERT
        got = table.read()
        assert got.count() == N - self.N_PHP_MATCHED + self.N_INSERT
        assert got.where(F.col("path") == "f3").collect()[0]["stars"] == 30
        assert got.where(F.col("path") == "f15").count() == 0  # php, deleted
        assert got.where(F.col("lang") == "go").count() == self.N_INSERT
        assert fsck(table, deep=True)["ok"]

    def test_update_all_star(self, table, spark):
        merge_into(
            table,
            _merge_source(spark),
            "m1",
            when_matched_update="*",
            when_not_matched_insert=False,
        )
        got = table.read()
        assert got.count() == N  # no inserts, no deletes
        row = got.where(F.col("path") == "f6").collect()[0]
        assert row["lang"] == "go" and row["stars"] == 60
        # unmatched rows carried verbatim
        assert got.where(F.col("path") == "f202").collect()[0]["lang"] == "py"

    def test_update_condition_gates(self, table, spark):
        r = merge_into(
            table,
            _merge_source(spark),
            "m1",
            when_matched_update={"stars": "src_stars"},
            when_not_matched_insert=False,
            update_condition="src_stars > stars",  # 10x vs 3x: all but id=0
        )
        assert r["updated_rows"] == self.N_MATCHED - 1  # id=0: 0 !> 0
        assert r["inserted_rows"] == 0

    def test_duplicate_source_keys_raise(self, table, spark):
        dup = _merge_source(spark).unionAll(_merge_source(spark).limit(1))
        with pytest.raises(ValueError, match="key-unique"):
            merge_into(table, dup, "m1", when_matched_update="*")

    def test_key_column_update_rejected(self, table, spark):
        with pytest.raises(ValueError, match="key column"):
            merge_into(
                table, _merge_source(spark), "m1",
                when_matched_update={"repo": "'x'"},
            )

    def test_no_clauses_rejected(self, table, spark):
        with pytest.raises(ValueError, match="no-op"):
            merge_into(
                table, _merge_source(spark), "m1",
                when_not_matched_insert=False,
            )

    def test_idempotent_replay(self, table, spark):
        merge_into(table, _merge_source(spark), "m1", when_matched_update="*")
        r2 = merge_into(table, _merge_source(spark), "m1",
                        when_matched_update="*")
        assert r2.get("skipped")

    def test_insert_fills_missing_source_columns_null(self, table, spark):
        src = _merge_source(spark).drop("content").where(
            F.col("path") == "f500"
        )
        merge_into(table, src, "m1", when_not_matched_insert=True)
        row = table.read().where(F.col("path") == "f500").collect()[0]
        assert row["content"] is None and row["stars"] == 5000

    def test_untouched_buckets_not_rewritten(self, table, spark):
        """Scale shape: a merge whose source hits ONE bucket must leave
        every other bucket's manifest pointers identical — the rewrite is
        O(touched buckets), not O(table)."""
        src = _merge_source(spark).limit(1)
        pre = table.snapshot()
        pre_files = {b: pre.files[b] for b in pre.files}
        r = merge_into(table, src, "m1", when_matched_update="*")
        assert len(r["buckets"]) == 1
        post = table.snapshot()
        for b in pre_files:
            if int(b) not in r["buckets"]:
                assert post.files[b] == pre_files[b]

    def test_count_actions_off_single_pass(self, table, spark):
        r = merge_into(
            table, _merge_source(spark), "m1",
            when_matched_update="*", count_actions=False,
        )
        assert r["updated_rows"] is None and r["inserted_rows"] is None
        got = table.read()
        assert got.count() == N + self.N_INSERT
        assert got.where(F.col("path") == "f6").collect()[0]["stars"] == 60
        assert fsck(table, deep=True)["ok"]

    def test_time_travel_sees_premerge(self, table, spark):
        pre = table.snapshot().snapshot_id
        merge_into(table, _merge_source(spark), "m1", when_matched_delete=True)
        assert table.read().count() == N - self.N_MATCHED + self.N_INSERT
        assert table.read(snapshot_id=pre).count() == N


class TestCLI:
    def test_cdc_delete_positional(self, table, capsys):
        from table2qb_spark.main import main

        rc = main([
            "cdc-delete", "--table", table.path,
            "--where", "lang=php", "--strategy", "positional",
            "--commit-id", "cli-d1",
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["deleted_rows"] == N_PHP and out["strategy"] == "positional"
        assert table.read().count() == N - N_PHP

    def test_cdc_merge_into(self, table, spark, tmp_path, capsys):
        from table2qb_spark.main import main

        src_path = str(tmp_path / "src")
        _merge_source(spark).write.parquet(src_path)
        rc = main([
            "cdc-merge-into", "--table", table.path,
            "--source", src_path,
            "--update-all",
            "--delete-where", "lang = 'php'",
            "--commit-id", "cli-m1",
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["deleted_rows"] == TestMergeInto.N_PHP_MATCHED
        assert out["inserted_rows"] == TestMergeInto.N_INSERT
        assert (
            table.read().count()
            == N - TestMergeInto.N_PHP_MATCHED + TestMergeInto.N_INSERT
        )

    def test_cdc_update(self, table, capsys):
        from table2qb_spark.main import main

        rc = main([
            "cdc-update", "--table", table.path,
            "--where", "path = 'f3'",
            "--set", "content=concat(content, '!')",
            "--commit-id", "cli-u1",
        ])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["updated_rows"] == 1
        got = table.read().where(F.col("path") == "f3").collect()[0]
        assert got["content"] == "c3!"
