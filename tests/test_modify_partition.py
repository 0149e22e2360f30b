"""ModifyPartition semantics from ModifyPartitionTest.kt:30-84."""

import pytest
from pyspark.sql import types as T

from kafka_connect_plugins_spark.config import ConfigException
from kafka_connect_plugins_spark.operators import ModifyPartition
from tests.helpers import make_envelope_df

VALUE_T = T.StructType([T.StructField("name", T.StringType())])
UUID = "04a96f30-3dfa-11ec-9bbc-0242ac130002"


def test_routes_to_golden_partition(spark):
    # ModifyPartitionTest.kt:30-49: account_id header UUID -> partition 7 of 10.
    df = make_envelope_df(
        spark, VALUE_T, [{"headers": {"account_id": UUID}, "value": {"name": "v"}}]
    )
    op = ModifyPartition({"header.key": "account_id", "number.partitions": 10})
    assert op.apply(df).first()["partition"] == 7


def test_missing_config_and_bad_partition_count():
    with pytest.raises(ConfigException):
        ModifyPartition({"header.key": "account_id"})  # missing number.partitions
    with pytest.raises(ConfigException):
        ModifyPartition({"header.key": "account_id", "number.partitions": 0})  # :71-84


def test_missing_header_errors(spark):
    # ModifyPartition.kt:42: missing header => error.
    df = make_envelope_df(spark, VALUE_T, [{"headers": {}, "value": {"name": "v"}}])
    op = ModifyPartition({"header.key": "account_id", "number.partitions": 10})
    with pytest.raises(Exception, match="account_id"):
        op.apply(df).collect()


def test_missing_header_tolerant_mode(spark):
    df = make_envelope_df(spark, VALUE_T, [{"headers": {}, "value": {"name": "v"}}])
    op = ModifyPartition(
        {"header.key": "account_id", "number.partitions": 10, "fail.on.missing.header": False}
    )
    assert op.apply(df).first()["partition"] is None


def test_physical_repartition(spark):
    rows = [{"headers": {"account_id": f"acct-{i}"}, "value": {"name": "v"}} for i in range(200)]
    df = make_envelope_df(spark, VALUE_T, rows)
    op = ModifyPartition(
        {"header.key": "account_id", "number.partitions": 5, "repartition.by.route": True}
    )
    out = op.apply(df)
    assert out.rdd.getNumPartitions() == 5
    assert out.count() == 200
