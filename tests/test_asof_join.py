"""As-of join: backward/forward semantics, exact-tie visibility, left-vs-
inner, tiebreak determinism, and the bucketed skew path's equivalence to
the simple path (including carries across right-empty buckets)."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from kafka_connect_plugins_spark.operators.asof_join import (
    asof_join,
    asof_join_bucketed,
)

T0 = dt.datetime(2024, 1, 1)


def _ts(hours: float) -> dt.datetime:
    return T0 + dt.timedelta(hours=hours)


@pytest.fixture(scope="module")
def small(spark):
    left = spark.createDataFrame(
        [(1, _ts(0), "e-early"),   # before any right row for key 1
         (1, _ts(5), "e-mid"),     # between r@2 and r@8
         (1, _ts(8), "e-tie"),     # exactly at r@8 — exact match counts
         (1, _ts(50), "e-late"),   # after everything
         (2, _ts(3), "e-nokey")],  # key with no right rows at all
        "k long, t timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, _ts(2), 100.0), (1, _ts(8), 200.0), (1, _ts(20), 300.0)],
        "k long, t timestamp, v double",
    )
    return left, right


def test_backward_left(small):
    left, right = small
    out = asof_join(left, right, "k", "k", "t", "t", how="left")
    got = {r["name"]: r["r_v"] for r in out.collect()}
    assert got == {
        "e-early": None,   # nothing at-or-before
        "e-mid": 100.0,    # r@2
        "e-tie": 200.0,    # exact-ts right row IS visible
        "e-late": 300.0,   # latest overall
        "e-nokey": None,   # key absent from right
    }
    assert out.count() == 5


def test_backward_inner_drops_unmatched(small):
    left, right = small
    out = asof_join(left, right, "k", "k", "t", "t", how="inner")
    assert {r["name"] for r in out.collect()} == {"e-mid", "e-tie", "e-late"}


def test_forward(small):
    left, right = small
    out = asof_join(left, right, "k", "k", "t", "t", direction="forward")
    got = {r["name"]: r["r_v"] for r in out.collect()}
    assert got == {
        "e-early": 100.0,  # earliest at-or-after is r@2
        "e-mid": 200.0,    # r@8
        "e-tie": 200.0,    # exact tie counts forward too
        "e-late": None,    # nothing after t=50
        "e-nokey": None,
    }


def test_tiebreak_determinism(spark):
    left = spark.createDataFrame([(1, _ts(10), "e")], "k long, t timestamp, name string")
    right = spark.createDataFrame(
        [(1, _ts(5), 7, "low"), (1, _ts(5), 9, "high")],
        "k long, t timestamp, seq int, v string",
    )
    back = asof_join(left, right, "k", "k", "t", "t", tiebreak="seq")
    assert back.collect()[0]["r_v"] == "high"  # backward keeps max tiebreak
    fwd = asof_join(left.withColumn("t", F.lit(_ts(0))), right,
                    "k", "k", "t", "t", direction="forward", tiebreak="seq")
    assert fwd.collect()[0]["r_v"] == "low"    # forward keeps min tiebreak


def test_validation(small):
    left, right = small
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, "k", "k", "t", "t", direction="nearest")
    with pytest.raises(ValueError, match="how"):
        asof_join(left, right, "k", "k", "t", "t", how="full")


def test_bucketed_matches_simple_randomized(spark):
    """Property: bucketed == simple on a deterministic random workload whose
    right side leaves multi-bucket gaps (keys 0-9; right rows only in the
    first quarter of the time range, so later buckets are right-empty and
    depend on the cross-bucket seed carry)."""
    rng = random.Random(42)
    lrows = [
        (k, _ts(rng.uniform(0, 24 * 120)), i)
        for i, k in enumerate(rng.choices(range(10), k=400))
    ]
    rrows = [
        (k, _ts(rng.uniform(0, 24 * 30)), float(i))
        for i, k in enumerate(rng.choices(range(8), k=120))  # keys 8,9 empty
    ]
    left = spark.createDataFrame(lrows, "k long, t timestamp, eid long")
    right = spark.createDataFrame(rrows, "k long, t timestamp, v double")

    simple = asof_join(left, right, "k", "k", "t", "t", how="left")
    bucketed = asof_join_bucketed(
        left, right, "k", "k", "t", "t", bucket="7 days", how="left"
    )
    key = lambda r: (r["eid"],)
    s = sorted(([r["eid"], r["r_v"], r["r_t"]] for r in simple.collect()))
    b = sorted(([r["eid"], r["r_v"], r["r_t"]] for r in bucketed.collect()))
    assert s == b
    assert len(s) == 400


def test_bucketed_inner(spark):
    left = spark.createDataFrame(
        [(1, _ts(100), "hit"), (1, _ts(0), "miss")],
        "k long, t timestamp, name string",
    )
    right = spark.createDataFrame([(1, _ts(1), 5.0)], "k long, t timestamp, v double")
    out = asof_join_bucketed(left, right, "k", "k", "t", "t",
                             bucket="1 day", how="inner")
    rows = out.collect()
    assert [(r["name"], r["r_v"]) for r in rows] == [("hit", 5.0)]


def test_plan_has_single_key_shuffle(small):
    """The simple path must plan exactly one Exchange (hash on the key) and
    no Python: union + window, not a range join or a cross product."""
    left, right = small
    out = asof_join(left, right, "k", "k", "t", "t")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "CartesianProduct" not in plan and "PythonUDF" not in plan
