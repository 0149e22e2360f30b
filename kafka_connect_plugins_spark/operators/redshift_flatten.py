"""Redshift-targeted flatten: nested payload → flat, JSON-stringified row.

Reference: RedShiftComplexDataTypeTransformer.kt:47-217.

Semantics reproduced:
- recursive struct flatten with ``_``-joined names (:69-75);
- ARRAY / MAP serialized to canonical JSON strings, null array → ``"[]"``,
  null map → ``"{}"`` (:121-140);
- all source fields forced optional (:189) — every output column is nullable;
- appended ``topic_key`` = stringified record key, default ``""`` (:191,
  206-208);
- appended ``tombstone`` boolean, true iff the value is null OR the payload's
  ``body`` field is null (:192, 213-215);
- appended ``_kafka_metadata_partition`` / ``_offset`` / ``_timestamp`` as
  STRINGS (:193-195, 200-204);
- field/parent default propagation via ``coalesce`` (:91-98, 155-157);
- unsupported types raise at plan time (:113-116).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_plugins_spark.config import ConfigDef
from kafka_connect_plugins_spark.envelope import (
    METADATA_OFFSET,
    METADATA_PARTITION,
    METADATA_TIMESTAMP,
)
from kafka_connect_plugins_spark.functions.flatten import flatten_columns
from kafka_connect_plugins_spark.functions.strings import stringify_any
from kafka_connect_plugins_spark.operators.base import Stage


class RedshiftFlatten(Stage):
    config_def = (
        ConfigDef()
        .define("value.column", str, "payload column", default="value")
        .define("key.column", str, "record key column", default="key")
        .define("body.field", str, "payload field whose nullness marks a tombstone", default="body")
        .define("defaults.json", str, "JSON object of {flat_name: default}", default="{}")
    )

    def configure(self, config: dict[str, Any]) -> None:
        self.value_column = config["value.column"]
        self.key_column = config["key.column"]
        self.body_field = config["body.field"]
        self.defaults: dict[str, Any] = json.loads(config["defaults.json"])

    def apply(self, df: DataFrame) -> DataFrame:
        value_type = df.schema[self.value_column].dataType
        if not isinstance(value_type, T.StructType):
            raise TypeError(
                f"RedshiftFlatten requires a struct payload, got {value_type.simpleString()}"
            )
        value = F.col(self.value_column)
        cols = flatten_columns(
            value_type, mode="redshift", value_col=self.value_column, defaults=self.defaults
        )
        tombstone = value.isNull()
        if self.body_field in value_type.fieldNames():
            tombstone = tombstone | value.getField(self.body_field).isNull()
        cols += [
            # topic_key stringifies ANY key type (struct/map -> JSON, binary ->
            # hex; RedShiftComplexDataTypeTransformer.kt:206-208)
            F.coalesce(
                stringify_any(F.col(self.key_column), df.schema[self.key_column].dataType),
                F.lit(""),
            ).alias("topic_key"),
            tombstone.alias("tombstone"),
            F.col("partition").cast("string").alias(METADATA_PARTITION),
            F.col("offset").cast("string").alias(METADATA_OFFSET),
            F.col("timestamp").cast("string").alias(METADATA_TIMESTAMP),
        ]
        return df.select(*cols)
