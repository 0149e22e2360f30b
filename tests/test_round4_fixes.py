"""Round-4 defect fixes (ADVICE.md): negative-LSN domain guard and
connected_components id-type validation."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from kafka_connect_plugins_spark.operators.neardup import connected_components
from kafka_connect_plugins_spark.plans.lake_table import LakeTable


def _table(spark, tmp_path, name="tbl", buckets=8):
    return LakeTable.create(
        spark, str(tmp_path / name), key_columns=["repo", "path"], num_buckets=buckets
    )


def _src(spark, rows):
    cols = ["repo", "path", "commit", "lang", "content", "_lsn", "_tombstone"]
    return spark.createDataFrame(
        [tuple(r.get(c) for c in cols) for r in rows],
        "repo string, path string, commit string, lang string, content string, "
        "_lsn long, _tombstone boolean",
    )


def test_negative_lsn_raises(spark, tmp_path):
    t = _table(spark, tmp_path, "neglsn")
    with pytest.raises(ValueError, match=r"non-negative"):
        t.merge(_src(spark, [
            {"repo": "r", "path": "p", "content": "x", "_lsn": -1, "_tombstone": False},
        ]))
    # a negative LOSER under a non-negative winner for the SAME key is also
    # caught (the guard reads the per-key min, not the min of winners)
    with pytest.raises(ValueError, match=r"non-negative"):
        t.merge(_src(spark, [
            {"repo": "r", "path": "p", "content": "new", "_lsn": 5, "_tombstone": False},
            {"repo": "r", "path": "p", "content": "old", "_lsn": -7, "_tombstone": False},
        ]))
    # zero is in-domain
    t.merge(_src(spark, [
        {"repo": "r", "path": "p", "content": "ok", "_lsn": 0, "_tombstone": False},
    ]))
    assert {(r["repo"], r["path"]): r["content"] for r in t.read().collect()} == {
        ("r", "p"): "ok"
    }


def test_connected_components_rejects_non_integral_ids(spark):
    nodes_s = spark.createDataFrame([("a",), ("b",)], "id string")
    edges_s = spark.createDataFrame([("a", "b")], "id_a string, id_b string")
    with pytest.raises(TypeError, match="integral"):
        connected_components(edges_s, nodes_s)
    # integral ids still work end-to-end
    nodes = spark.createDataFrame([(1,), (2,), (3,), (9,)], "id long")
    edges = spark.createDataFrame([(2, 1), (2, 3)], "id_a long, id_b long")
    got = {r["id"]: r["cluster_id"] for r in connected_components(edges, nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 9: 9}


def test_connected_components_rejects_mixed_edge_types(spark):
    nodes = spark.createDataFrame([(1,), (2,)], "id long")
    edges = spark.createDataFrame([(1, "2")], "id_a long, id_b string")
    with pytest.raises(TypeError, match="edge dst"):
        connected_components(edges, nodes)
