"""CDC wire-format adapters: Debezium and MongoDB change streams → merge source.

The reference's pipelines consume MongoDB Kafka source-connector change
events (its ClickHouse flatten tests build fixtures with ``MongoSourceConfig``
/ ``BsonValueToSchemaAndValue``, ClickHouseFlattenTransformerTest.kt:3-8),
and a Debezium-style relational envelope (``before``/``after``/``op``/
``source.lsn``) is the generic binlog/WAL tail shape. Both adapters here are
pure plan transformations — ``from_json`` with the full envelope schema
applied once at plan time, vectorized JVM parsing, zero Python in the row
path — emitting the engine's canonical merge-source columns
(key + payload + ``_lsn`` + ``_tombstone``) that :meth:`LakeTable.merge`
and :class:`LwwDedup` consume directly.

Scale notes: map-only (no shuffle introduced here); the downstream merge's
key shuffle is unchanged. Malformed lines follow the same dead-letter
contract as :mod:`kafka_connect_plugins_spark.sources.json_envelope`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_plugins_spark.plans.lake_table import LSN_COL, TOMBSTONE_COL

__all__ = [
    "debezium_envelope_schema",
    "debezium_to_merge_source",
    "merge_source_to_envelope",
    "mongo_changestream_schema",
    "mongo_changestream_to_merge_source",
    "tail_wire_format",
]


def debezium_envelope_schema(row_type: T.StructType) -> T.StructType:
    """The Debezium payload envelope for a table whose rows are
    ``row_type``: ``before``/``after`` carry full row images, ``op`` is
    c(reate)/u(pdate)/d(elete)/r(ead, snapshot), ``source.lsn`` is the
    WAL/binlog position (the monotonic commit-LSN the engine orders on),
    ``ts_ms`` the connector-side wall clock fallback."""
    return T.StructType(
        [
            T.StructField("before", row_type, True),
            T.StructField("after", row_type, True),
            T.StructField(
                "source",
                T.StructType(
                    [
                        T.StructField("lsn", T.LongType(), True),
                        T.StructField("ts_ms", T.LongType(), True),
                        T.StructField("db", T.StringType(), True),
                        T.StructField("table", T.StringType(), True),
                    ]
                ),
                True,
            ),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
        ]
    )


def debezium_to_merge_source(
    df: DataFrame,
    row_type: T.StructType,
    key_columns: list[str],
    json_col: str = "value",
    keep_corrupt: bool = False,
) -> DataFrame:
    """Parse a raw Debezium-JSON string column into merge-source rows.

    Upserts (``op`` c/u/r) take the ``after`` image; deletes take their KEY
    from the ``before`` image (Debezium deletes carry no after), null
    payload, ``_tombstone = true`` — exactly the shape the engine's retained
    delete markers need. ``_lsn`` is ``source.lsn`` with ``ts_ms`` fallback
    for connectors that don't populate it. Rows whose envelope fails to
    parse (or with an unknown ``op``) are dropped, or kept under
    ``_corrupt_record`` with every other column null when
    ``keep_corrupt=True`` (dead-letter contract).
    """
    missing = [k for k in key_columns if k not in row_type.fieldNames()]
    if missing:
        raise ValueError(f"key columns {missing} not in row schema")
    env = debezium_envelope_schema(row_type)
    parsed = df.withColumn(
        "__env", F.from_json(F.col(json_col).cast("string"), env)
    )
    op = F.col("__env.op")
    is_delete = op == F.lit("d")
    valid = op.isin("c", "u", "r", "d")
    cols = []
    for f_ in row_type.fields:
        if f_.name in key_columns:
            # delete events image the key in `before`
            c = F.when(is_delete, F.col(f"__env.before.{f_.name}")).otherwise(
                F.col(f"__env.after.{f_.name}")
            )
        else:
            c = F.when(is_delete, F.lit(None).cast(f_.dataType)).otherwise(
                F.col(f"__env.after.{f_.name}")
            )
        cols.append(c.alias(f_.name))
    cols.append(
        F.coalesce(F.col("__env.source.lsn"), F.col("__env.ts_ms")).alias(LSN_COL)
    )
    cols.append(is_delete.alias(TOMBSTONE_COL))
    if keep_corrupt:
        cols.append(
            F.when(~F.coalesce(valid, F.lit(False)), F.col(json_col).cast("string"))
            .alias("_corrupt_record")
        )
        return parsed.select(*cols)
    return parsed.filter(F.coalesce(valid, F.lit(False))).select(*cols)


def merge_source_to_envelope(src: DataFrame, key_columns: list[str]) -> DataFrame:
    """Lift merge-source rows (any adapter's output) into the engine's
    change-event envelope, so the full ingest chain — SMT pipeline, DLQ,
    ``foreachBatch`` MERGE — runs unchanged on a Debezium or Mongo tail.

    Key columns concatenate into the envelope ``key`` (the composite-key
    convention ``events_to_merge_source`` splits back apart); payload
    columns pack into ``value``, null for tombstones (the envelope's
    delete encoding); ``_lsn`` becomes ``offset``. ``partition`` is 0 —
    a wire tail has no Kafka partition; per-partition lineage collapses
    to one global watermark, which is exactly the stream's total order.
    """
    from kafka_connect_plugins_spark.engine import KEY_SEP

    payload = [
        c
        for c in src.columns
        if c not in {*key_columns, LSN_COL, TOMBSTONE_COL, "_corrupt_record"}
    ]
    value = F.when(
        ~F.coalesce(F.col(TOMBSTONE_COL), F.lit(False)),
        F.struct(*[F.col(c) for c in payload]),
    )
    return src.select(
        F.lit("cdc").alias("topic"),
        F.lit(0).alias("partition"),
        F.col(LSN_COL).cast("long").alias("offset"),
        F.lit(None).cast("long").alias("timestamp"),
        F.concat_ws(KEY_SEP, *[F.col(k).cast("string") for k in key_columns]).alias("key"),
        F.lit(None).cast("map<string,string>").alias("headers"),
        value.alias("value"),
    )


def tail_wire_format(
    spark,
    events_dir: str,
    wire_format: str,
    row_type: T.StructType,
    key_columns: list[str],
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Stream a JSON-lines CDC tail in a public wire format as envelope rows.

    ``readStream.text`` is the sandbox stand-in for the Kafka value stream
    (on a cluster, swap in ``format("kafka")`` and the same adapters run on
    ``CAST(value AS STRING)``). ``wire_format`` is ``"debezium"`` or
    ``"mongo"``; for Mongo the key is always ``_id`` and ``key_columns`` is
    ignored. Returns an UNBOUNDED DataFrame ready for
    :meth:`StreamingIngest.start`.
    """
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.text(events_dir)  # column: value string
    if wire_format == "debezium":
        src = debezium_to_merge_source(raw, row_type, key_columns)
        return merge_source_to_envelope(src, key_columns)
    if wire_format == "mongo":
        src = mongo_changestream_to_merge_source(raw, row_type)
        return merge_source_to_envelope(src, ["_id"])
    raise ValueError(f"unknown wire format {wire_format!r} (debezium | mongo)")


# BSON timestamps order change streams: (t seconds, i ordinal-within-second).
# Packed into one long they are the stream's monotonic LSN.
_TS = T.StructType(
    [T.StructField("t", T.LongType(), True), T.StructField("i", T.LongType(), True)]
)


def mongo_changestream_schema(doc_type: T.StructType) -> T.StructType:
    """The MongoDB change-stream document (extended-JSON shapes as the
    Mongo Kafka source connector emits them): ``operationType``,
    ``documentKey._id`` (typed like the document's ``_id``),
    ``fullDocument`` (requires the connector's
    ``change.stream.full.document=updateLookup`` so updates carry the full
    post-image — partial update deltas cannot LWW-merge), ``clusterTime``
    as the ``$timestamp {t, i}`` BSON pair."""
    if "_id" not in doc_type.fieldNames():
        raise ValueError("document schema must contain _id")
    id_type = doc_type["_id"].dataType
    return T.StructType(
        [
            T.StructField("operationType", T.StringType(), True),
            T.StructField(
                "documentKey",
                T.StructType([T.StructField("_id", id_type, True)]),
                True,
            ),
            T.StructField("fullDocument", doc_type, True),
            T.StructField(
                "clusterTime",
                T.StructType([T.StructField("$timestamp", _TS, True)]),
                True,
            ),
        ]
    )


def mongo_changestream_to_merge_source(
    df: DataFrame,
    doc_type: T.StructType,
    json_col: str = "value",
    keep_corrupt: bool = False,
) -> DataFrame:
    """Parse raw Mongo change-stream JSON into merge-source rows keyed on
    ``_id``.

    insert/update/replace take ``fullDocument``; delete takes its key from
    ``documentKey`` with ``_tombstone = true``. ``_lsn`` packs the BSON
    cluster timestamp ``(t, i)`` into one long (``t << 32 | i``) — the
    change stream's total order. Non-document operations (``drop``,
    ``invalidate``, ...) and unparseable lines are dropped, or dead-lettered
    under ``_corrupt_record`` when ``keep_corrupt=True``.
    """
    env = mongo_changestream_schema(doc_type)
    parsed = df.withColumn(
        "__env", F.from_json(F.col(json_col).cast("string"), env)
    )
    op = F.col("__env.operationType")
    is_delete = op == F.lit("delete")
    valid = op.isin("insert", "update", "replace", "delete")
    ts = F.col("__env.clusterTime.`$timestamp`")
    cols = []
    for f_ in doc_type.fields:
        if f_.name == "_id":
            c = F.when(is_delete, F.col("__env.documentKey._id")).otherwise(
                F.col("__env.fullDocument._id")
            )
        else:
            c = F.when(is_delete, F.lit(None).cast(f_.dataType)).otherwise(
                F.col(f"__env.fullDocument.{f_.name}")
            )
        cols.append(c.alias(f_.name))
    cols.append(
        (F.shiftleft(F.coalesce(ts["t"], F.lit(0)), 32) + F.coalesce(ts["i"], F.lit(0)))
        .cast("long")
        .alias(LSN_COL)
    )
    cols.append(is_delete.alias(TOMBSTONE_COL))
    if keep_corrupt:
        cols.append(
            F.when(~F.coalesce(valid, F.lit(False)), F.col(json_col).cast("string"))
            .alias("_corrupt_record")
        )
        return parsed.select(*cols)
    return parsed.filter(F.coalesce(valid, F.lit(False))).select(*cols)
