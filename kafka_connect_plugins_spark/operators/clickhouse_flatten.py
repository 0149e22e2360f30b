"""ClickHouse-targeted flatten: nested payload → flat row, native arrays/maps.

Reference: ClickHouseFlattenTransformer.kt:80-244.

Semantics reproduced:
- same recursive struct flatten as the Redshift variant but ARRAY / MAP keep
  their native types (:116-132, 145-159);
- appended ``topic_key`` string (default ``""``), ``is_deleted`` int8,
  ``_kafka_metadata_partition`` string, ``_kafka_metadata_offset`` string,
  ``_kafka_metadata_timestamp`` int64 (:216-220, 224-229);
- ``is_deleted = 1`` iff value null ∨ ``body`` null ∨ ``body.deleted_at``
  non-null (:238-242);
- tombstones (null value) are DROPPED when ``skip.tombstones`` (default true),
  the reference's only row-dropping operator (:38-39, 58-72, 198-201); with
  ``skip.tombstones=false`` they flow through with ``is_deleted=1``.
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
from kafka_connect_plugins_spark.functions.paths import dot_path_exists
from kafka_connect_plugins_spark.functions.strings import stringify_any
from kafka_connect_plugins_spark.operators.base import Stage


class ClickHouseFlatten(Stage):
    config_def = (
        ConfigDef()
        .define("value.column", str, "payload column", default="value")
        .define("key.column", str, "record key column", default="key")
        .define("body.field", str, "payload field whose nullness marks deletion", default="body")
        .define("deleted.at.field", str, "dot path (within value) marking soft deletion", default="body.deleted_at")
        .define("skip.tombstones", bool, "drop null-value records", default=True)
        .define("defaults.json", str, "JSON object of {flat_name: default}", default="{}")
    )

    def configure(self, config: dict[str, Any]) -> None:
        self.value_column = config["value.column"]
        self.key_column = config["key.column"]
        self.body_field = config["body.field"]
        self.deleted_at_field = config["deleted.at.field"]
        self.skip_tombstones = config["skip.tombstones"]
        self.defaults: dict[str, Any] = json.loads(config["defaults.json"])

    def apply(self, df: DataFrame) -> DataFrame:
        value_type = df.schema[self.value_column].dataType
        if not isinstance(value_type, T.StructType):
            raise TypeError(
                f"ClickHouseFlatten requires a struct payload, got {value_type.simpleString()}"
            )
        if self.skip_tombstones:
            # ClickHouseFlattenTransformer.kt:198-201 — early drop: Catalyst pushes
            # this filter ahead of the projection, skipping all downstream work.
            df = df.filter(F.col(self.value_column).isNotNull())
        value = F.col(self.value_column)
        cols = flatten_columns(
            value_type, mode="clickhouse", value_col=self.value_column, defaults=self.defaults
        )
        deleted = value.isNull()
        if self.body_field in value_type.fieldNames():
            deleted = deleted | value.getField(self.body_field).isNull()
        if dot_path_exists(df, self.value_column, self.deleted_at_field):
            marker = value
            for part in self.deleted_at_field.split("."):
                marker = marker.getField(part)
            deleted = deleted | marker.isNotNull()
        cols += [
            # topic_key stringifies ANY key type (struct/map -> JSON, binary ->
            # hex; RedShiftComplexDataTypeTransformer.kt:206-208)
            F.coalesce(
                stringify_any(F.col(self.key_column), df.schema[self.key_column].dataType),
                F.lit(""),
            ).alias("topic_key"),
            F.when(deleted, 1).otherwise(0).cast("tinyint").alias("is_deleted"),
            F.col("partition").cast("string").alias(METADATA_PARTITION),
            F.col("offset").cast("string").alias(METADATA_OFFSET),
            F.col("timestamp").cast("long").alias(METADATA_TIMESTAMP),
        ]
        return df.select(*cols)
