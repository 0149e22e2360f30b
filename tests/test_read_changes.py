"""Change-data-feed between snapshots (LakeTable.read_changes)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_connect_plugins_spark.plans.lake_table import LakeTable


def _merge(table, rows, epoch):
    df = table.spark.createDataFrame(
        rows, "repo string, path string, content string, _lsn long, _tombstone boolean"
    )
    return table.merge(df, lsn_col="_lsn", tombstone_col="_tombstone", epoch_id=epoch)


def test_read_changes_insert_update_delete(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), key_columns=["repo", "path"], num_buckets=8)
    _merge(t, [
        Row(repo="r", path="a", content="a1", _lsn=1, _tombstone=False),
        Row(repo="r", path="b", content="b1", _lsn=2, _tombstone=False),
        Row(repo="r", path="c", content="c1", _lsn=3, _tombstone=False),
    ], epoch=0)
    v1 = t.manifest()["version"]
    _merge(t, [
        Row(repo="r", path="a", content="a2", _lsn=10, _tombstone=False),   # update
        Row(repo="r", path="b", content=None, _lsn=11, _tombstone=True),    # delete
        Row(repo="r", path="d", content="d1", _lsn=12, _tombstone=False),   # insert
    ], epoch=1)
    v2 = t.manifest()["version"]

    ch = {(r.path): (r._change_type, r.content, r._commit_version)
          for r in t.read_changes(v1, v2).collect()}
    assert ch["a"] == ("update_postimage", "a2", v2)
    assert ch["b"][0] == "delete" and ch["b"][1] == "b1"
    assert ch["d"] == ("insert", "d1", v2)
    assert "c" not in ch  # carried forward untouched (or same _lsn) -> no-op


def test_read_changes_from_empty_table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), key_columns=["repo", "path"], num_buckets=4)
    v0 = t.manifest()["version"]
    _merge(t, [Row(repo="r", path="x", content="x1", _lsn=1, _tombstone=False)], epoch=0)
    ch = t.read_changes(v0)
    rows = ch.collect()
    assert len(rows) == 1 and rows[0]._change_type == "insert" and rows[0].path == "x"


def test_read_changes_noop_and_full_cycle(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), key_columns=["repo", "path"], num_buckets=4)
    _merge(t, [Row(repo="r", path="x", content="x1", _lsn=1, _tombstone=False)], epoch=0)
    v1 = t.manifest()["version"]
    assert t.read_changes(v1, v1).count() == 0
    # delete then re-insert across two snapshots: net change v1 -> v3 is one update
    _merge(t, [Row(repo="r", path="x", content=None, _lsn=5, _tombstone=True)], epoch=1)
    _merge(t, [Row(repo="r", path="x", content="x3", _lsn=9, _tombstone=False)], epoch=2)
    v3 = t.manifest()["version"]
    rows = t.read_changes(v1, v3).collect()
    assert len(rows) == 1 and rows[0]._change_type == "update_postimage"
    assert rows[0].content == "x3"
    # applying the feed to the v1 snapshot reproduces the v3 snapshot
    feed = t.read_changes(v1, v3)
    assert feed.filter(F.col("_change_type") != "delete").count() == 1
