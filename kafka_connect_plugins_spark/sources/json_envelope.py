"""JSON change-event ingestion — the Connect ``JsonConverter`` analogue.

In Kafka Connect the converter sits between the transport and the SMT chain,
deserializing bytes into ``SchemaAndValue`` (reference README.md:26-31 wires
``value.converter`` next to ``transforms``; JsonToHexTransformer.kt:94-98 is
the schemaless-JSON path). Here the same seam is a plan stage: a raw string
column (a Kafka ``value``, a JSON-lines file) parses into the typed envelope
via ``from_json`` — schema applied once at plan time, parsing vectorized in
the JVM, malformed rows surfaced explicitly rather than killing the task.

Works for both batch (``spark.read``) and streaming (``spark.readStream``)
inputs; the downstream chain is source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_plugins_spark.envelope import (
    HEADER_LIST_COL,
    envelope_schema,
    header_list_to_map,
)

CORRUPT_COL = "_corrupt_record"


def parse_json_envelope(
    df: DataFrame,
    value_type: T.DataType,
    json_col: str = "value",
    keep_corrupt: bool = False,
    header_list: bool = False,
) -> DataFrame:
    """Parse a raw-JSON string column into typed envelope columns.

    The Kafka path: ``spark.readStream.format("kafka")`` yields
    ``value: binary`` — cast to string and hand it here. ``from_json`` in
    PERMISSIVE mode nulls out unparseable rows; with ``keep_corrupt`` the
    original string is retained in ``_corrupt_record`` for a dead-letter
    sink, otherwise malformed rows are dropped (the converter's
    ``errors.tolerance=all`` vs ``none`` knob).

    ``header_list=True`` parses and retains the ``headers_list``
    (``array<struct<key,value>>``) envelope column — the full ordered header
    multi-map, duplicate keys preserved in order. When a line carries the
    list but no map, the map column is derived from it (last-wins), so
    downstream map readers keep working; header-aware stages prefer the list
    via :func:`kafka_connect_plugins_spark.envelope.header_column`.
    """
    schema = envelope_schema(value_type, header_list=header_list)
    parsed = df.withColumn("__env", F.from_json(F.col(json_col).cast("string"), schema))
    # A malformed line parses to an all-null struct (PERMISSIVE mode never
    # raises); topic is non-null in every real envelope, so it is the
    # validity sentinel.
    bad = F.col("__env").isNull() | F.col("__env.topic").isNull()
    out = parsed.select(
        *[F.col(f"__env.{f.name}").alias(f.name) for f in schema.fields],
        *(
            [F.when(bad, F.col(json_col).cast("string")).alias(CORRUPT_COL)]
            if keep_corrupt
            else []
        ),
    )
    if header_list:
        out = out.withColumn(
            "headers",
            F.coalesce(
                F.col("headers"), header_list_to_map(F.col(HEADER_LIST_COL))
            ),
        )
    if not keep_corrupt:
        out = out.filter(F.col("topic").isNotNull())
    return out


def read_json_envelope(
    spark: SparkSession,
    path: str,
    value_type: T.DataType,
    streaming: bool = False,
    keep_corrupt: bool = False,
    header_list: bool = False,
) -> DataFrame:
    """Read JSON-lines change events (one envelope object per line).

    Batch or streaming over the same layout; the explicit schema keeps Spark
    from running a sampling inference pass (which a 100 TB log cannot afford)
    and makes new unknown fields an explicit schema-registry event rather
    than a silent inference change.

    Routed through :func:`parse_json_envelope` so file-based ingestion and
    Kafka-value parsing share one malformed-row contract: a corrupt line is
    dropped (default) or retained in ``_corrupt_record`` for a dead-letter
    sink (``keep_corrupt=True``) — never a silent all-null row.
    """
    reader = spark.readStream if streaming else spark.read
    lines = reader.text(path)
    return parse_json_envelope(
        lines, value_type, json_col="value", keep_corrupt=keep_corrupt,
        header_list=header_list,
    )
