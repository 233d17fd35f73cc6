"""Named snapshot refs (tags): creation/resolution semantics, expiry
pinning, and the ref-accepting CLI surfaces (cdc-tag / cdc-diff /
cdc-rollback).

Reference analog: Iceberg table refs (tags) — the reference CLI has no lake
layer, so this is north-rule-added surface; semantics are pinned against our
own time-travel reads (a tagged snapshot must stay readable through
expire_snapshots) and the exclusive-create contract (concurrent taggers
cannot clobber each other).
"""
import json

import pytest

from table2qb_spark.cdc.verify import table_sha256
from table2qb_spark.lake.expire import expire_snapshots
from table2qb_spark.main import main
from tests.test_rollback import three_batches


class TestTagSemantics:
    def test_create_list_resolve_delete(self, spark, tmp_path):
        t, sid_b1 = three_batches(spark, tmp_path)
        current = t.current_snapshot_id()

        doc = t.create_tag("corpus-v1", snapshot_id=sid_b1)
        assert doc["snapshot_id"] == sid_b1
        assert t.create_tag("latest")["snapshot_id"] == current

        tags = t.list_tags()
        assert set(tags) == {"corpus-v1", "latest"}
        assert tags["corpus-v1"]["snapshot_id"] == sid_b1

        # the ref grammar: digits -> id, anything else -> tag
        assert t.resolve_ref("corpus-v1") == sid_b1
        assert t.resolve_ref(str(sid_b1)) == sid_b1
        assert t.resolve_ref(sid_b1) == sid_b1

        # exclusive create: a second tagger must fail loudly, not clobber
        with pytest.raises(ValueError, match="already exists"):
            t.create_tag("corpus-v1", snapshot_id=current)
        assert t.resolve_ref("corpus-v1") == sid_b1
        t.create_tag("corpus-v1", snapshot_id=current, force=True)
        assert t.resolve_ref("corpus-v1") == current

        t.delete_tag("latest")
        with pytest.raises(ValueError, match="no such tag"):
            t.resolve_ref("latest")
        with pytest.raises(ValueError, match="no such tag"):
            t.delete_tag("latest")

    def test_name_validation_and_missing_snapshot(self, spark, tmp_path):
        t, _sid = three_batches(spark, tmp_path)
        # all-digits would be ambiguous with snapshot ids; separators would
        # escape the refs dir
        for bad in ("123", "", "a/b", "a b"):
            with pytest.raises(ValueError, match="invalid tag name"):
                t.create_tag(bad)
        with pytest.raises(FileNotFoundError):
            t.create_tag("ok", snapshot_id=999)

    def test_tag_pins_snapshot_against_expiry(self, spark, tmp_path):
        t, sid_b1 = three_batches(spark, tmp_path)
        sha_b1 = table_sha256(t.read(snapshot_id=sid_b1))
        t.create_tag("v1", snapshot_id=sid_b1)

        res = expire_snapshots(t, keep_last=1)
        assert sid_b1 in res["retained"]  # pinned despite keep_last=1
        assert table_sha256(t.read(snapshot_id=sid_b1)) == sha_b1

        # untagging releases the pin: the next expiry really drops it
        t.delete_tag("v1")
        res = expire_snapshots(t, keep_last=1)
        assert sid_b1 not in res["retained"]
        with pytest.raises(FileNotFoundError):
            t.read(snapshot_id=sid_b1)


class TestTagCli:
    def test_cdc_tag_and_ref_surfaces(self, spark, tmp_path, capsys):
        t, sid_b1 = three_batches(spark, tmp_path)
        sha_b1 = table_sha256(t.read(snapshot_id=sid_b1))
        path = t.path

        assert main(["cdc-tag", "--table", path, "--create", "v1",
                     "--snapshot", str(sid_b1)]) == 0
        doc = json.loads(capsys.readouterr().out)
        assert doc == {"name": "v1", "snapshot_id": sid_b1,
                       "created_ms": doc["created_ms"]}

        assert main(["cdc-tag", "--table", path, "--create", "v1"]) == 1
        assert "already exists" in capsys.readouterr().err

        assert main(["cdc-tag", "--table", path]) == 0
        assert json.loads(capsys.readouterr().out)["v1"]["snapshot_id"] == sid_b1

        # cdc-diff accepts the tag wherever a snapshot id goes
        assert main(["cdc-diff", "--table", path,
                     "--from-snapshot", "v1"]) == 0
        out = json.loads(capsys.readouterr().out)
        assert out["from"] == sid_b1 and out["changes"]

        assert main(["cdc-diff", "--table", path,
                     "--from-snapshot", "nosuch"]) == 1
        assert "no such tag" in capsys.readouterr().err

        # rollback to the tag restores the tagged state exactly
        assert main(["cdc-rollback", "--table", path,
                     "--to-snapshot", "v1"]) == 0
        capsys.readouterr()
        assert table_sha256(t.read()) == sha_b1

        assert main(["cdc-tag", "--table", path, "--delete", "v1"]) == 0
        assert json.loads(capsys.readouterr().out) == {"deleted": "v1"}
