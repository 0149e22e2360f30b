"""Time travel and snapshot expiry."""

import os

import pytest
from pyspark.sql import Row

from kafka_connect_plugins_spark.plans.lake_table import LakeTable


def _merge(table, rows, epoch):
    df = table.spark.createDataFrame(
        rows, "repo string, path string, content string, _lsn long, _tombstone boolean"
    )
    return table.merge(df, lsn_col="_lsn", tombstone_col="_tombstone", epoch_id=epoch)


def _mk(spark, tmp_path, n_buckets=4):
    return LakeTable.create(
        spark, str(tmp_path / "t"), key_columns=["repo", "path"], num_buckets=n_buckets
    )


def test_time_travel_read(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _merge(t, [Row(repo="r", path="a", content="v1", _lsn=1, _tombstone=False)], epoch=0)
    v1 = t.manifest()["version"]
    _merge(t, [Row(repo="r", path="a", content="v2", _lsn=2, _tombstone=False)], epoch=1)
    assert t.read().collect()[0].content == "v2"
    assert t.read(version=v1).collect()[0].content == "v1"


def test_expire_snapshots_gc(spark, tmp_path):
    t = _mk(spark, tmp_path)
    for e in range(4):
        _merge(t, [Row(repo="r", path=f"p{e}", content=f"c{e}", _lsn=e, _tombstone=False)], epoch=e)
    data_dirs_before = {d for d in os.listdir(os.path.join(t.root, "data"))}
    assert len(data_dirs_before) == 4
    stats = t.expire_snapshots(keep_last=1)
    assert stats["manifests_removed"] > 0
    # current snapshot still reads every key (clean buckets' dirs retained)
    assert {r.path for r in t.read().collect()} == {"p0", "p1", "p2", "p3"}
    # old manifests gone -> time travel past the horizon fails
    with pytest.raises(FileNotFoundError):
        t.manifest(1)


def test_expire_keeps_time_travel_window(spark, tmp_path):
    t = _mk(spark, tmp_path)
    _merge(t, [Row(repo="r", path="a", content="v1", _lsn=1, _tombstone=False)], epoch=0)
    v1 = t.manifest()["version"]
    _merge(t, [Row(repo="r", path="a", content="v2", _lsn=2, _tombstone=False)], epoch=1)
    t.expire_snapshots(keep_last=2)
    # v1 still within the retained window
    assert t.read(version=v1).collect()[0].content == "v1"
    assert t.read().collect()[0].content == "v2"
