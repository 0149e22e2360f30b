"""Interval join: containment semantics, half-open bounds, bucket-width
independence (the result must not depend on the physical bucketing), no
duplicate pairs, and degenerate intervals."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from kafka_connect_plugins_spark.operators.interval_join import interval_join

T0 = dt.datetime(2024, 1, 1)


def _ts(hours: float) -> dt.datetime:
    return T0 + dt.timedelta(hours=hours)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [(1, _ts(0), "at-start"),     # == r1.start: half-open -> matches
         (1, _ts(12), "inside"),
         (1, _ts(24), "at-end"),      # == r1.end: excluded
         (1, _ts(30), "in-second"),
         (2, _ts(12), "wrong-key")],
        "k long, t timestamp, name string",
    )
    right = spark.createDataFrame(
        [(1, _ts(0), _ts(24), "r1"),
         (1, _ts(20), _ts(40), "r2"),      # overlaps r1: 'inside' twice? no — 12<20
         (1, _ts(100), _ts(100), "empty"), # zero-width: matches nothing
         (1, _ts(60), _ts(50), "inverted")],
        "k long, s timestamp, e timestamp, tag string",
    )
    return left, right


def test_containment_half_open(sides):
    left, right = sides
    out = interval_join(left, right, "k", "k", "t", "s", "e", bucket="6 hours")
    got = sorted((r["name"], r["r_tag"]) for r in out.collect())
    assert got == [
        ("at-end", "r2"),      # t=24 excluded from r1 [0,24), inside r2 [20,40)
        ("at-start", "r1"),
        ("in-second", "r2"),
        ("inside", "r1"),
    ]


def test_overlapping_intervals_yield_multiple_pairs(spark):
    left = spark.createDataFrame([(1, _ts(21), "e")], "k long, t timestamp, name string")
    right = spark.createDataFrame(
        [(1, _ts(0), _ts(24), "a"), (1, _ts(20), _ts(40), "b")],
        "k long, s timestamp, e timestamp, tag string",
    )
    out = interval_join(left, right, "k", "k", "t", "s", "e", bucket="1 day")
    assert sorted(r["r_tag"] for r in out.collect()) == ["a", "b"]


@pytest.mark.parametrize("bucket", ["3 hours", "1 day", "13 days"])
def test_bucket_width_is_physical_only(spark, bucket):
    """Same logical result for any bucket width — including widths much
    larger and much smaller than the intervals."""
    rng = random.Random(7)
    left = spark.createDataFrame(
        [(k, _ts(rng.uniform(0, 24 * 60)), i)
         for i, k in enumerate(rng.choices(range(5), k=300))],
        "k long, t timestamp, eid long",
    )
    rows = []
    for j in range(60):
        start = rng.uniform(0, 24 * 55)
        rows.append((rng.randrange(5), _ts(start), _ts(start + rng.uniform(1, 24 * 10)), j))
    right = spark.createDataFrame(rows, "k long, s timestamp, e timestamp, rid long")

    got = sorted(
        (r["eid"], r["r_rid"])
        for r in interval_join(left, right, "k", "k", "t", "s", "e",
                               bucket=bucket).collect()
    )
    want = sorted(
        (r["eid"], r["rid"])
        for r in left.join(
            right,
            (left["k"] == right["k"]) & (left["t"] >= right["s"]) & (left["t"] < right["e"]),
        ).collect()
    )
    assert got == want and len(got) == len(set(got))  # equal AND pair-unique


def test_no_nested_loop_in_plan(sides):
    left, right = sides
    out = interval_join(left, right, "k", "k", "t", "s", "e", bucket="6 hours")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan, plan
