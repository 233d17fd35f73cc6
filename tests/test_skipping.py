"""File-level data skipping: footer stats extraction (leaf-index-safe),
predicate parsing/admission (pure functions — no Spark), and the
LakeTable read-path integration (pruned file set + identical results)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from table2qb_spark.lake.skipping import (
    file_column_stats,
    parse_predicates,
    stats_admit,
)


class TestParse:
    def test_ops_and_types(self):
        assert parse_predicates("repo=alpha,seq>=900,score<0.5") == [
            ("repo", "=", "alpha"),
            ("seq", ">=", 900),
            ("score", "<", 0.5),
        ]

    def test_two_char_ops_win(self):
        assert parse_predicates("a<=3") == [("a", "<=", 3)]
        assert parse_predicates("a>=3") == [("a", ">=", 3)]

    def test_bad_spec(self):
        with pytest.raises(ValueError):
            parse_predicates("nonsense")


class TestAdmit:
    def test_range_logic(self):
        stats = {"seq": [100, 200], "repo": ["a", "m"]}
        assert stats_admit(stats, [("seq", ">=", 150)])
        assert not stats_admit(stats, [("seq", ">=", 201)])
        assert stats_admit(stats, [("seq", ">=", 200)])
        assert not stats_admit(stats, [("seq", "<", 100)])
        assert stats_admit(stats, [("seq", "<", 101)])
        assert not stats_admit(stats, [("seq", "=", 99)])
        assert stats_admit(stats, [("repo", "=", "b")])
        assert not stats_admit(stats, [("repo", "=", "z")])

    def test_conjunction(self):
        stats = {"seq": [100, 200]}
        assert not stats_admit(stats, [("seq", ">=", 150), ("seq", "<", 120)])

    def test_contradictory_equalities(self):
        stats = {"seq": [0, 10**9]}
        assert not stats_admit(stats, [("seq", "=", 5), ("seq", "=", 6)])
        assert stats_admit(stats, [("seq", "=", 5), ("seq", "=", 5)])

    def test_open_bound_touching(self):
        stats = {"seq": [100, 200]}
        # pred interval (200, inf) cannot touch a closed max of 200
        assert not stats_admit(stats, [("seq", ">", 200)])
        assert stats_admit(stats, [("seq", ">=", 200)])
        assert not stats_admit(stats, [("seq", ">=", 150), ("seq", "<", 150)])
        assert stats_admit(stats, [("seq", ">=", 150), ("seq", "<=", 150)])

    def test_missing_stats_admit(self):
        assert stats_admit(None, [("seq", "=", 1)])
        assert stats_admit({}, [("seq", "=", 1)])
        assert stats_admit({"other": [1, 2]}, [("seq", "=", 10**9)])

    def test_type_mismatch_admits(self):
        # string stats vs numeric literal must not prune (unknown collation)
        assert stats_admit({"seq": ["100", "200"]}, [("seq", "=", 500)])
        assert stats_admit({"seq": [100, 200]}, [("seq", "=", "500")])


class TestFooterStats:
    def _write(self, tmp_path, table, name="f.parquet", **kw):
        p = str(tmp_path / name)
        pq.write_table(table, p, **kw)
        return pq.read_metadata(p)

    def test_leaf_index_safety_struct_before_column(self, tmp_path):
        """A struct column ahead of the requested one must not shift the
        stats read onto the wrong leaf (round-3 regression class)."""
        t = pa.table(
            {
                "meta": [{"a": 7, "b": 8}, {"a": 9, "b": 10}],
                "seq": pa.array([100, 200], pa.int64()),
                "repo": ["alpha", "zulu"],
            }
        )
        md = self._write(tmp_path, t)
        stats = file_column_stats(md, {"seq", "repo"})
        assert stats["seq"] == [100, 200]
        assert stats["repo"] == ["alpha", "zulu"]

    def test_multi_row_group_union(self, tmp_path):
        t = pa.table({"seq": pa.array(list(range(1000)), pa.int64())})
        md = self._write(tmp_path, t, row_group_size=100)
        assert md.num_row_groups == 10
        assert file_column_stats(md, {"seq"})["seq"] == [0, 999]

    def test_binary_column_skipped(self, tmp_path):
        t = pa.table({"blob": pa.array([b"\xff\xfe", b"\x00"], pa.binary())})
        md = self._write(tmp_path, t)
        assert file_column_stats(md, {"blob"}) == {}

    def test_all_null_column_unprunable(self, tmp_path):
        t = pa.table({"seq": pa.array([None, None], pa.int64())})
        md = self._write(tmp_path, t)
        assert "seq" not in file_column_stats(md, {"seq"})
