"""Outbound CDC envelope (lake/diff.snapshot_diff_envelope + cdc-diff
--envelope): Debezium-shaped change events with before/after row images.

The load-bearing property is LOOP CLOSURE: the envelope emitted between two
snapshots, converted to a change batch, must replay a copy of the ``from``
state into a table digest-identical to the ``to`` state — the engine's own
ingest (merge_upsert) is the consumer of its own producer.
"""
import json

from pyspark.sql import functions as F

from table2qb_spark.cdc.verify import table_sha256
from table2qb_spark.lake.diff import snapshot_diff_envelope
from table2qb_spark.lake.merge import merge_upsert
from table2qb_spark.main import main
from tests.test_rollback import batch_df, make_table, three_batches


class TestEnvelope:
    def test_shapes_and_images(self, spark, tmp_path):
        t, sid_b1 = three_batches(spark, tmp_path)
        env = snapshot_diff_envelope(t, sid_b1)
        rows = {(r["repo"], r["path"]): r for r in env.collect()}
        # update: both images present, post-image differs
        u = rows[("r1", "a.py")]
        assert u["op"] == "u"
        assert u["before"]["content"] == "v1" and u["after"]["content"] == "v2"
        # insert: no before image
        c = rows[("r3", "c.py")]
        assert c["op"] == "c" and c["before"] is None
        assert c["after"]["content"] == "v1"
        # delete: no after image, key still routable from the flat columns
        d = rows[("r2", "b.py")]
        assert d["op"] == "d" and d["after"] is None
        assert d["before"]["content"] == "v1"
        assert {r["from_snapshot"] for r in rows.values()} == {sid_b1}
        assert {r["to_snapshot"] for r in rows.values()} == {
            t.current_snapshot_id()
        }

    def test_envelope_replays_from_state_to_state(self, spark, tmp_path):
        t, sid_b1 = three_batches(spark, tmp_path)
        env = snapshot_diff_envelope(t, sid_b1)

        # consumer side: envelope -> change batch (op c/u -> upsert of the
        # after image; d -> delete of the key), one synthetic seq for all
        # (one row per key per envelope, so no intra-batch ordering needed)
        value_cols = ["commit", "lang", "content"]
        events = env.select(
            F.when(F.col("op") == "d", "D").otherwise("U").alias("op"),
            F.lit(999).alias("seq"),
            "repo", "path",
            *[F.col(f"after.{c}").alias(c) for c in value_cols],
        )

        t2 = make_table(spark, tmp_path / "consumer")
        merge_upsert(t2, batch_df(spark, [
            (1, "I", "r1", "a.py", "c1", "py", "v1"),
            (2, "I", "r2", "b.py", "c2", "go", "v1"),
        ]), "b1")  # reproduce the `from` state
        assert table_sha256(t2.read()) == table_sha256(
            t.read(snapshot_id=sid_b1)
        )
        merge_upsert(t2, events, "env")

        cols = ["repo", "path", "commit", "lang", "content"]
        assert table_sha256(t.read().select(*cols)) == table_sha256(
            t2.read().select(*cols)
        )

    def test_cli_envelope_counts(self, spark, tmp_path, capsys):
        t, sid_b1 = three_batches(spark, tmp_path)
        assert main(["cdc-diff", "--table", t.path, "--envelope",
                     "--from-snapshot", str(sid_b1)]) == 0
        out = json.loads(capsys.readouterr().out)
        assert out["changes"] == {"c": 1, "u": 1, "d": 1}
