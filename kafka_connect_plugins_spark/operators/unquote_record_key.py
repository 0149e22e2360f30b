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
        return df.withColumn(self.key_column, unquote_both_ends(F.col(self.key_column)))
