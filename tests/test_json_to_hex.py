"""JsonToHex semantics from JsonToHexTransformerTest.kt:26-245."""

import json

from pyspark.sql import types as T

from kafka_connect_plugins_spark.operators import JsonToHex
from tests.helpers import make_envelope_df

STRUCT_T = T.StructType(
    [T.StructField("name", T.StringType()), T.StructField("count", T.LongType())]
)


def _decode(hex_str: str) -> str:
    return bytes.fromhex(hex_str).decode("utf-8")


def test_string_value_passthrough_roundtrip(spark):
    payload = '{"a": 1, "emoji": "\U0001f680", "quote": "he said \\"hi\\"", "nl": "a\\nb"}'
    df = make_envelope_df(spark, T.StringType(), [{"value": payload, "offset": 11, "partition": 2}])
    row = JsonToHex().apply(df).first()
    hexed = row["json_hex"]
    assert hexed == hexed.lower() and len(hexed) % 2 == 0  # lowercase, even length (:76-79)
    assert _decode(hexed) == payload  # String passthrough (:94-96)
    # metadata types: partition int32, offset/timestamp int64 (:104-117)
    assert row["_kafka_metadata_partition"] == 2
    assert row["_kafka_metadata_offset"] == 11
    assert isinstance(row["_kafka_metadata_timestamp"], int)


def test_struct_value_serialized_to_json(spark):
    df = make_envelope_df(spark, STRUCT_T, [{"value": {"name": "héllo", "count": 7}}])
    row = JsonToHex().apply(df).first()
    assert json.loads(_decode(row["json_hex"])) == {"name": "héllo", "count": 7}


def test_custom_field_name(spark):
    df = make_envelope_df(spark, T.StringType(), [{"value": "{}"}])
    row = JsonToHex({"hex.field.name": "payload_hex"}).apply(df).first()
    assert _decode(row["payload_hex"]) == "{}"


def test_wide_payload_roundtrip(spark):
    # 1000-field payload (JsonToHexTransformerTest.kt:150-184)
    payload = json.dumps({f"field_{i}": i for i in range(1000)})
    df = make_envelope_df(spark, T.StringType(), [{"value": payload}])
    row = JsonToHex().apply(df).first()
    assert json.loads(_decode(row["json_hex"])) == json.loads(payload)
