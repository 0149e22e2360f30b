"""Flatten goldens from RedShiftComplexDataTypeTransformerTest.kt and
ClickHouseFlattenTransformerTest.kt, over the F2-style employee payload."""

import json

import pytest
from pyspark.sql import types as T

from kafka_connect_plugins_spark.functions.flatten import UnsupportedTypeError, flatten_columns
from kafka_connect_plugins_spark.operators import ClickHouseFlatten, RedshiftFlatten
from tests.helpers import make_envelope_df

BODY_T = T.StructType(
    [
        T.StructField("email", T.StringType()),
        T.StructField("observer", T.BooleanType()),
        T.StructField("deleted_at", T.LongType()),
        T.StructField(
            "test_array_of_structs",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("demographic_id", T.StringType()),
                        T.StructField("demographic_value_id", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("test_string_array", T.ArrayType(T.StringType())),
        T.StructField("test_array_of_arrays", T.ArrayType(T.ArrayType(T.StringType()))),
        T.StructField("test_map", T.MapType(T.StringType(), T.IntegerType())),
    ]
)
VALUE_T = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("event_created_at", T.LongType()),
        T.StructField("body", BODY_T),
        T.StructField(
            "metadata",
            T.StructType(
                [
                    T.StructField("correlation_id", T.StringType()),
                    T.StructField("service", T.StringType()),
                ]
            ),
        ),
    ]
)

LIVE_VALUE = {
    "id": "id-1",
    "event_created_at": 1637000000000,
    "body": {
        "email": "jo@example.com",
        "observer": None,  # default should kick in
        "deleted_at": None,
        "test_array_of_structs": [
            {"demographic_id": "d1", "demographic_value_id": "v1"},
            {"demographic_id": "d2", "demographic_value_id": "v2"},
        ],
        "test_string_array": ["x", "y"],
        "test_array_of_arrays": [["a"], ["b", "c"]],
        "test_map": {"k1": 1, "k2": 2},
    },
    "metadata": {"correlation_id": "corr-1", "service": None},
}

DEFAULTS = {"metadata_service": "Default-Service", "body_observer": True}


def _df(spark, rows):
    return make_envelope_df(spark, VALUE_T, rows)


def _redshift(spark, rows):
    op = RedshiftFlatten({"defaults.json": json.dumps(DEFAULTS)})
    return op.apply(_df(spark, rows))


def test_redshift_flatten_names_and_json(spark):
    row = _redshift(spark, [{"key": "key-1", "value": LIVE_VALUE, "partition": 3, "offset": 42}]).first()
    # _-joined flatten naming (RedShiftComplexDataTypeTransformer.kt:69-75)
    assert row["body_email"] == "jo@example.com"
    assert row["metadata_correlation_id"] == "corr-1"
    # arrays/maps to canonical JSON strings (:121-140)
    assert json.loads(row["body_test_string_array"]) == ["x", "y"]
    assert json.loads(row["body_test_array_of_structs"]) == [
        {"demographic_id": "d1", "demographic_value_id": "v1"},
        {"demographic_id": "d2", "demographic_value_id": "v2"},
    ]
    assert json.loads(row["body_test_array_of_arrays"]) == [["a"], ["b", "c"]]
    assert json.loads(row["body_test_map"]) == {"k1": 1, "k2": 2}
    # appended columns (:191-195)
    assert row["topic_key"] == "key-1"
    assert row["tombstone"] is False
    assert row["_kafka_metadata_partition"] == "3"  # stringified (:200-204)
    assert row["_kafka_metadata_offset"] == "42"
    # defaults (:91-98,155-157)
    assert row["body_observer"] is True
    assert row["metadata_service"] == "Default-Service"


def test_redshift_null_collections_render_empty(spark):
    value = dict(LIVE_VALUE, body=dict(LIVE_VALUE["body"]))
    value["body"]["test_string_array"] = None
    value["body"]["test_map"] = None
    row = _redshift(spark, [{"value": value}]).first()
    assert row["body_test_string_array"] == "[]"  # :124-131
    assert row["body_test_map"] == "{}"  # :132-137


def test_redshift_null_body_is_tombstone_with_defaults(spark):
    # RedShiftComplexDataTypeTransformerTest.kt:87-113: v2 fixture has body=null.
    value = dict(LIVE_VALUE, body=None, metadata={"correlation_id": "c", "service": None})
    row = _redshift(spark, [{"key": None, "value": value}]).first()
    assert row["tombstone"] is True
    assert row["topic_key"] == ""  # default empty key (:191)
    assert row["metadata_service"] == "Default-Service"
    assert row["body_email"] is None
    assert row["body_test_string_array"] == "[]"


def test_redshift_null_value_is_tombstone(spark):
    row = _redshift(spark, [{"key": "k", "value": None}]).first()
    assert row["tombstone"] is True
    assert row["topic_key"] == "k"


def test_clickhouse_preserves_native_collections(spark):
    op = ClickHouseFlatten({"defaults.json": json.dumps(DEFAULTS)})
    row = op.apply(_df(spark, [{"key": "k", "value": LIVE_VALUE, "offset": 7}])).first()
    assert row["body_test_string_array"] == ["x", "y"]  # native array (:116-132)
    assert row["body_test_map"] == {"k1": 1, "k2": 2}  # native map
    assert row["body_test_array_of_arrays"] == [["a"], ["b", "c"]]
    assert row["is_deleted"] == 0
    assert row["_kafka_metadata_offset"] == "7"  # string (:216-220)
    assert row["_kafka_metadata_timestamp"] == 1637000000000  # int64 (:224-229)


def test_clickhouse_is_deleted_matrix(spark):
    deleted_value = dict(LIVE_VALUE, body=dict(LIVE_VALUE["body"], deleted_at=123))
    null_body = dict(LIVE_VALUE, body=None)
    op = ClickHouseFlatten()
    rows = op.apply(
        _df(
            spark,
            [
                {"offset": 0, "value": LIVE_VALUE},
                {"offset": 1, "value": deleted_value},  # deleted_at non-null => 1 (:238-242)
                {"offset": 2, "value": null_body},  # null body => 1
            ],
        )
    ).orderBy("_kafka_metadata_offset").collect()
    assert [r["is_deleted"] for r in rows] == [0, 1, 1]


def test_clickhouse_tombstone_skip_vs_keep(spark):
    rows = [{"offset": 0, "value": LIVE_VALUE}, {"offset": 1, "key": "k", "value": None}]
    dropped = ClickHouseFlatten().apply(_df(spark, rows))
    assert dropped.count() == 1  # default skip (:198-201)
    kept = ClickHouseFlatten({"skip.tombstones": False}).apply(_df(spark, rows))
    assert kept.count() == 2
    tomb = kept.filter("_kafka_metadata_offset = '1'").first()
    assert tomb["is_deleted"] == 1 and tomb["topic_key"] == "k"


def test_unsupported_type_raises():
    bad = T.StructType([T.StructField("d", T.DecimalType(10, 2))])
    with pytest.raises(UnsupportedTypeError):
        flatten_columns(bad)  # RedShiftComplexDataTypeTransformer.kt:113-116
