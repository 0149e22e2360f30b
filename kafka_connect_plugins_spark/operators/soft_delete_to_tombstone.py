"""Convert soft-deleted rows into tombstones (null value).

Reference: SoftDeleteToTombstoneTransformer.kt:29-55 — if the field at a
dot-notation path (default ``body.deleted_at``) is non-null, the record's
value and value schema are replaced with null so a JDBC sink issues DELETE;
key / topic / partition / timestamp are preserved (:43-46). Null values,
non-Struct values, and null intermediate structs pass through (:49-55) —
Spark's nested field access is null-propagating, giving the same semantics.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_connect_plugins_spark.config import ConfigDef
from kafka_connect_plugins_spark.functions.paths import dot_path_col, dot_path_exists
from kafka_connect_plugins_spark.operators.base import Stage


class SoftDeleteToTombstone(Stage):
    config_def = (
        ConfigDef()
        .define("field", str, "dot path to the soft-delete marker", default="body.deleted_at")
        .define("value.column", str, "column holding the record value", default="value")
    )

    def configure(self, config: dict[str, Any]) -> None:
        self.field = config["field"]
        self.value_column = config["value.column"]

    def apply(self, df: DataFrame) -> DataFrame:
        # Plan-time analogue of the reference's extractValue returning null on a
        # missing path: if the path does not resolve in this stream's schema the
        # stage is an identity (SoftDeleteToTombstoneTransformer.kt:49-55).
        if not dot_path_exists(df, self.value_column, self.field):
            return df
        marker = dot_path_col(self.value_column, self.field)
        value_type = df.schema[self.value_column].dataType
        tombstoned = F.when(marker.isNotNull(), F.lit(None).cast(value_type)).otherwise(
            F.col(self.value_column)
        )
        return df.withColumn(self.value_column, tombstoned)
