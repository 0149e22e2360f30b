"""LWW dedup: both strategies agree and pick max-(lsn, tiebreak) per key."""

import pytest
from pyspark.sql import types as T

from kafka_connect_plugins_spark.operators import LwwDedup
from tests.helpers import make_envelope_df

VALUE_T = T.StructType([T.StructField("content", T.StringType())])

ROWS = [
    {"key": "a", "offset": 1, "value": {"content": "a-old"}},
    {"key": "a", "offset": 9, "value": {"content": "a-new"}},
    {"key": "a", "offset": 5, "value": {"content": "a-mid"}},
    {"key": "b", "offset": 2, "value": {"content": "b-only"}},
    {"key": "c", "offset": 3, "value": {"content": "c-old"}},
    {"key": "c", "offset": 3, "value": {"content": "c-old"}},  # exact duplicate
]


@pytest.mark.parametrize("strategy", ["max_by", "window"])
def test_keeps_max_lsn_per_key(spark, strategy):
    df = make_envelope_df(spark, VALUE_T, ROWS)
    op = LwwDedup({"key.columns": "key", "lsn.column": "offset", "strategy": strategy})
    got = {r["key"]: (r["offset"], r["value"]["content"]) for r in op.apply(df).collect()}
    assert got == {"a": (9, "a-new"), "b": (2, "b-only"), "c": (3, "c-old")}


def test_tiebreak_deterministic(spark):
    rows = [
        {"key": "k", "offset": 7, "timestamp": 100, "value": {"content": "first"}},
        {"key": "k", "offset": 7, "timestamp": 200, "value": {"content": "second"}},
    ]
    df = make_envelope_df(spark, VALUE_T, rows)
    for strategy in ("max_by", "window"):
        op = LwwDedup(
            {
                "key.columns": "key",
                "lsn.column": "offset",
                "tiebreak.column": "timestamp",
                "strategy": strategy,
            }
        )
        assert op.apply(df).first()["value"]["content"] == "second"


def test_strategies_agree_on_random_input(spark):
    import random

    rng = random.Random(42)
    rows = [
        {"key": f"k{rng.randrange(20)}", "offset": i, "value": {"content": f"c{i}"}}
        for i in range(500)
    ]
    df = make_envelope_df(spark, VALUE_T, rows)
    base = {"key.columns": "key", "lsn.column": "offset"}
    a = LwwDedup({**base, "strategy": "max_by"}).apply(df)
    b = LwwDedup({**base, "strategy": "window"}).apply(df)
    rows_a = sorted((r["key"], r["offset"]) for r in a.collect())
    rows_b = sorted((r["key"], r["offset"]) for r in b.collect())
    assert rows_a == rows_b
