"""Golden CRC32 routing values from PartitionerTest.kt:11-19 and ModifyPartitionTest.kt:63-67."""

from pyspark.sql import functions as F

from kafka_connect_plugins_spark.functions.hashing import crc32_pmod

import pytest


@pytest.mark.parametrize(
    "key,n,expected",
    [
        ("04a96f30-3dfa-11ec-9bbc-0242ac130002", 10, 7),  # PartitionerTest.kt:11-15 (UUID)
        ("my-string", 10, 0),  # PartitionerTest.kt:17-19
    ],
)
def test_golden_partitions(spark, key, n, expected):
    row = spark.range(1).select(crc32_pmod(F.lit(key), n).alias("p")).first()
    assert row["p"] == expected


def test_fmod_non_negative(spark):
    # Partitioner.kt:48 — fmod is always >= 0 for any key.
    df = spark.range(500).select(crc32_pmod(F.col("id").cast("string"), 7).alias("p"))
    stats = df.agg(F.min("p").alias("lo"), F.max("p").alias("hi")).first()
    assert stats["lo"] >= 0 and stats["hi"] <= 6


def test_rejects_non_positive_partition_count():
    with pytest.raises(ValueError):
        crc32_pmod(F.lit("x"), 0)
