"""Strip one pair of surrounding double quotes from string record keys.

Reference: UnquoteRecordKey.kt:19-40 — only String keys are touched (:21-24);
the quote must be present at both ends (Kotlin ``removeSurrounding``, :25);
null keys, unquoted keys and single-side quotes pass unchanged
(UnquoteRecordKeyTest.kt:66-98). Value / topic / partition / timestamp are
preserved (:30-39).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_connect_plugins_spark.config import ConfigDef
from kafka_connect_plugins_spark.functions.strings import unquote_both_ends
from kafka_connect_plugins_spark.operators.base import Stage


class UnquoteRecordKey(Stage):
    config_def = ConfigDef().define("key.column", str, "column holding the record key", default="key")

    def configure(self, config: dict[str, Any]) -> None:
        self.key_column = config["key.column"]

    def apply(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import types as T

        # Non-String keys pass unchanged (UnquoteRecordKey.kt:21-24,
        # UnquoteRecordKeyTest.kt:76-90: Int / Struct keys are untouched).
        # The type check is plan-time — a struct-keyed stream flows through
        # with zero added work.
        if not isinstance(df.schema[self.key_column].dataType, T.StringType):
            return df
        return df.withColumn(self.key_column, unquote_both_ends(F.col(self.key_column)))
