"""Serialize the payload to JSON and hex-encode it (Redshift VARBYTE feed).

Reference: JsonToHexTransformer.kt:63-128 — String values pass through as-is,
anything else is JSON-serialized (:94-98); the UTF-8 bytes are encoded as
lowercase hex (:76-79); output is a struct named ``HexEncodedJson`` with a
configurable hex field name (default ``json_hex``) plus kafka metadata:
``_kafka_metadata_partition:int32, _kafka_metadata_offset:int64,
_kafka_metadata_timestamp:int64`` (:104-117).
"""

from __future__ import annotations

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
from kafka_connect_plugins_spark.functions.strings import hex_of_utf8
from kafka_connect_plugins_spark.operators.base import Stage


class JsonToHex(Stage):
    config_def = (
        ConfigDef()
        .define("hex.field.name", str, "output hex column name", default="json_hex")
        .define("value.column", str, "payload column", default="value")
    )

    def configure(self, config: dict[str, Any]) -> None:
        self.hex_field = config["hex.field.name"]
        self.value_column = config["value.column"]

    def apply(self, df: DataFrame) -> DataFrame:
        value_type = df.schema[self.value_column].dataType
        value = F.col(self.value_column)
        # String passthrough vs JSON serialization (JsonToHexTransformer.kt:94-98).
        json_str = value if isinstance(value_type, T.StringType) else F.to_json(value)
        return df.select(
            hex_of_utf8(json_str).alias(self.hex_field),
            F.col("partition").cast("int").alias(METADATA_PARTITION),
            F.col("offset").cast("long").alias(METADATA_OFFSET),
            F.col("timestamp").cast("long").alias(METADATA_TIMESTAMP),
        )
