"""Deterministic sampling/split: partition-independence, disjointness,
uniformity, and validation errors."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_plugins_spark.functions.sampling import (
    deterministic_sample,
    hash_split,
    hash_uniform,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 20_000).withColumnRenamed("id", "key")


def test_sample_stable_under_repartition(ids):
    a = ids.filter(deterministic_sample("key", 0.1))
    b = ids.repartition(17, "key").filter(deterministic_sample("key", 0.1))
    assert sorted(r["key"] for r in a.collect()) == sorted(
        r["key"] for r in b.collect()
    )


def test_sample_fraction_roughly_holds(ids):
    n = ids.filter(deterministic_sample("key", 0.25)).count()
    assert abs(n / 20_000 - 0.25) < 0.02  # md5 is uniform; 20k draws


def test_sample_nested_monotone(ids):
    """A 5% sample is a subset of the 20% sample — threshold semantics, so
    growing the fraction only ADDS rows (critical for reproducible
    curriculum/scale-up experiments)."""
    small = {r["key"] for r in ids.filter(deterministic_sample("key", 0.05)).collect()}
    big = {r["key"] for r in ids.filter(deterministic_sample("key", 0.20)).collect()}
    assert small <= big


def test_split_disjoint_exhaustive(ids):
    out = ids.withColumn(
        "split", hash_split("key", {"train": 0.8, "val": 0.1, "test": 0.1})
    )
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 20_000  # every row exactly one label
    assert abs(counts["train"] / 20_000 - 0.8) < 0.02


def test_split_weights_normalized(ids):
    a = ids.withColumn("s", hash_split("key", {"a": 1.0, "b": 1.0}))
    b = ids.withColumn("s", hash_split("key", {"a": 50.0, "b": 50.0}))
    assert a.collect() == b.collect()


def test_uniform_range(ids):
    row = ids.select(
        F.min(hash_uniform("key")).alias("lo"), F.max(hash_uniform("key")).alias("hi")
    ).collect()[0]
    assert 0.0 <= row["lo"] and row["hi"] < 1.0


def test_validation():
    with pytest.raises(ValueError, match="fraction"):
        deterministic_sample("k", 1.5)
    with pytest.raises(ValueError, match="non-empty"):
        hash_split("k", {})
    with pytest.raises(ValueError, match="sum"):
        hash_split("k", {"a": 0.0})
