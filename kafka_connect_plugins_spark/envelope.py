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

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Outer envelope fields, in canonical order. `value` is appended by callers
# with a stream-specific payload StructType.
ENVELOPE_FIELDS = [
    T.StructField("topic", T.StringType(), False),
    T.StructField("partition", T.IntegerType(), False),
    T.StructField("offset", T.LongType(), False),  # commit-LSN, monotonic per (topic, partition)
    T.StructField("timestamp", T.LongType(), True),  # epoch millis
    T.StructField("key", T.StringType(), True),
    # Kafka headers are an ordered MULTI-map (a record may carry duplicate
    # keys); the reference only ever reads headers().lastWithName(key)
    # (ModifyPartition.kt:36) — last-wins. A map column collapses duplicates
    # to exactly the last value, so every operator's OBSERVABLE semantics
    # match the reference, but the envelope cannot round-trip the full
    # multi-valued list. Sources that must preserve it should carry an
    # additional array<struct<key,value>> column and read it through
    # :func:`last_with_name`, which implements the same accessor over either
    # shape.
    T.StructField("headers", T.MapType(T.StringType(), T.StringType(), True), True),
]

# Header-list shape for sources that must round-trip duplicate keys.
HEADER_LIST_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("key", T.StringType(), False),
            T.StructField("value", T.StringType(), True),
        ]
    )
)

# Optional envelope column carrying the FULL ordered multi-map (Kafka's real
# header shape). Sources attach it via ``envelope_schema(header_list=True)``
# / ``changelog(header_list=True)``; header-reading operators resolve keys
# through :func:`header_column`, which prefers this column when present.
HEADER_LIST_COL = "headers_list"


def last_with_name(headers: Column, key: str) -> Column:
    """Kafka's ``Headers.lastWithName(key)`` over an
    ``array<struct<key,value>>`` header list (ModifyPartition.kt:36): the
    LAST entry with the given key, NULL when absent — native Column
    expressions, no UDF. (For the envelope's map shape, a plain
    ``headers[key]`` lookup is already last-wins, because map construction
    kept the last duplicate.)
    """
    return F.try_element_at(
        F.filter(headers, lambda h: h["key"] == F.lit(key)), F.lit(-1)
    )["value"]


def header_column(df, key: str) -> Column:
    """Shape-aware ``lastWithName(key)`` for an envelope DataFrame.

    When the envelope carries the full ordered multi-map
    (:data:`HEADER_LIST_COL`), that column is authoritative — duplicate keys
    resolve to the genuinely LAST entry exactly as
    ``Headers.lastWithName`` does (ModifyPartition.kt:36). Otherwise the
    map column's lookup applies (already last-wins at map construction).
    The two shapes agree whenever both are present by the map's
    construction contract (:func:`header_list_to_map`).
    """
    if HEADER_LIST_COL in df.columns:
        lst = last_with_name(F.col(HEADER_LIST_COL), key)
        if "headers" not in df.columns:
            return lst
        # PER-ROW fallback: a mixed stream can carry list-less lines (the
        # JSON source parses absent keys to NULL) whose map still has the
        # header — the list is authoritative only where it exists.
        return F.when(F.col(HEADER_LIST_COL).isNotNull(), lst).otherwise(
            F.col("headers").getItem(key)
        )
    return F.col("headers").getItem(key)


def header_list_to_map(headers: Column) -> Column:
    """Collapse an ``array<struct<key,value>>`` header list into the
    envelope's map shape with Kafka's last-wins duplicate semantics —
    independent of ``spark.sql.mapKeyDedupPolicy`` (whose default EXCEPTION
    would fail on duplicates, and whose LAST_WIN is a session-global knob
    this library must not depend on). Distinct keys are extracted first, so
    ``map_from_entries`` never sees a duplicate.
    """
    distinct_keys = F.array_distinct(F.transform(headers, lambda h: h["key"]))
    return F.map_from_entries(
        F.transform(
            distinct_keys,
            lambda k: F.struct(
                k.alias("key"),
                F.try_element_at(
                    F.filter(headers, lambda h: h["key"] == k), F.lit(-1)
                )["value"].alias("value"),
            ),
        )
    )

METADATA_PARTITION = "_kafka_metadata_partition"
METADATA_OFFSET = "_kafka_metadata_offset"
METADATA_TIMESTAMP = "_kafka_metadata_timestamp"


def envelope_schema(
    value_type: T.DataType,
    key_type: T.DataType | None = None,
    header_list: bool = False,
) -> T.StructType:
    """Full envelope schema for a given payload struct type.

    ``key_type`` defaults to string; pass a StructType (or any other type)
    for Debezium-style composite keys — the reference handles arbitrary key
    types (UnquoteRecordKey.kt:21-24 passes non-String keys unchanged;
    RedShiftComplexDataTypeTransformer.kt:206-208 stringifies any key into
    ``topic_key``), and so does every stage here (see
    :func:`kafka_connect_plugins_spark.functions.strings.stringify_any`).

    ``header_list=True`` appends the :data:`HEADER_LIST_COL` column
    (``array<struct<key,value>>``) so the source round-trips Kafka's ordered
    multi-map — duplicate header keys included — not just the collapsed map.
    """
    fields = list(ENVELOPE_FIELDS)
    if key_type is not None:
        fields = [
            T.StructField("key", key_type, True) if f.name == "key" else f for f in fields
        ]
    if header_list:
        fields = fields + [T.StructField(HEADER_LIST_COL, HEADER_LIST_TYPE, True)]
    return T.StructType(fields + [T.StructField("value", value_type, True)])
