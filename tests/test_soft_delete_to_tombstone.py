"""SoftDeleteToTombstone semantics from SoftDeleteToTombstoneTransformerTest.kt:58-167."""

from pyspark.sql import types as T

from kafka_connect_plugins_spark.operators import SoftDeleteToTombstone
from tests.helpers import make_envelope_df

VALUE_T = T.StructType(
    [
        T.StructField(
            "body",
            T.StructType(
                [
                    T.StructField("deleted_at", T.LongType()),
                    T.StructField("name", T.StringType()),
                ]
            ),
        ),
        T.StructField("metadata", T.StringType()),
    ]
)


def test_soft_deleted_becomes_tombstone(spark):
    df = make_envelope_df(
        spark,
        VALUE_T,
        [{"key": "k1", "value": {"body": {"deleted_at": 1000, "name": "x"}, "metadata": "m"}}],
    )
    row = SoftDeleteToTombstone().apply(df).first()
    assert row["value"] is None  # value nulled
    assert row["key"] == "k1"  # key preserved (:152-167)
    assert row["topic"] == "test-topic"
    assert row["timestamp"] is not None


def test_live_record_unchanged(spark):
    df = make_envelope_df(
        spark,
        VALUE_T,
        [{"value": {"body": {"deleted_at": None, "name": "x"}, "metadata": "m"}}],
    )
    row = SoftDeleteToTombstone().apply(df).first()
    assert row["value"]["body"]["name"] == "x"


def test_null_value_passthrough(spark):
    df = make_envelope_df(spark, VALUE_T, [{"key": "k", "value": None}])
    row = SoftDeleteToTombstone().apply(df).first()
    assert row["value"] is None and row["key"] == "k"


def test_null_intermediate_struct_passthrough(spark):
    df = make_envelope_df(spark, VALUE_T, [{"value": {"body": None, "metadata": "m"}}])
    row = SoftDeleteToTombstone().apply(df).first()
    assert row["value"]["metadata"] == "m"


def test_custom_and_missing_paths(spark):
    df = make_envelope_df(
        spark, VALUE_T, [{"value": {"body": {"deleted_at": 5, "name": "x"}, "metadata": "m"}}]
    )
    # A path that does not resolve in the schema => identity (:49-55).
    row = SoftDeleteToTombstone({"field": "metadata.removed_at"}).apply(df).first()
    assert row["value"] is not None
    # Top-level existing path on a string field: non-null => tombstone.
    row2 = SoftDeleteToTombstone({"field": "metadata"}).apply(df).first()
    assert row2["value"] is None
