"""The change-event envelope: Spark's row analogue of Kafka Connect's record.

The reference's unit of data is a ``ConnectRecord`` — topic / kafkaPartition /
keySchema+key / valueSchema+value / timestamp / headers / (SinkRecord-only)
kafkaOffset (see e.g. /root/reference/src/main/kotlin/.../transforms/
ModifyPartition.kt:36-44 and JsonToHexTransformer.kt:104-117). Here the
envelope is one row of a DataFrame with a fixed outer schema; ``value`` is a
payload struct whose inner schema varies per stream; ``offset`` generalizes to
the monotonic commit-LSN that drives last-writer-wins dedup; ``value IS NULL``
is the tombstone encoding.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Outer envelope fields, in canonical order. `value` is appended by callers
# with a stream-specific payload StructType.
ENVELOPE_FIELDS = [
    T.StructField("topic", T.StringType(), False),
    T.StructField("partition", T.IntegerType(), False),
    T.StructField("offset", T.LongType(), False),  # commit-LSN, monotonic per (topic, partition)
    T.StructField("timestamp", T.LongType(), True),  # epoch millis
    T.StructField("key", T.StringType(), True),
    T.StructField("headers", T.MapType(T.StringType(), T.StringType(), True), True),
]

METADATA_PARTITION = "_kafka_metadata_partition"
METADATA_OFFSET = "_kafka_metadata_offset"
METADATA_TIMESTAMP = "_kafka_metadata_timestamp"


def envelope_schema(
    value_type: T.DataType, key_type: T.DataType | None = None
) -> T.StructType:
    """Full envelope schema for a given payload struct type.

    ``key_type`` defaults to string; pass a StructType (or any other type)
    for Debezium-style composite keys — the reference handles arbitrary key
    types (UnquoteRecordKey.kt:21-24 passes non-String keys unchanged;
    RedShiftComplexDataTypeTransformer.kt:206-208 stringifies any key into
    ``topic_key``), and so does every stage here (see
    :func:`kafka_connect_plugins_spark.functions.strings.stringify_any`).
    """
    fields = list(ENVELOPE_FIELDS)
    if key_type is not None:
        fields = [
            T.StructField("key", key_type, True) if f.name == "key" else f for f in fields
        ]
    return T.StructType(fields + [T.StructField("value", value_type, True)])
