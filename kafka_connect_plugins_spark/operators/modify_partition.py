"""Header-driven partition routing.

Reference: ModifyPartition.kt:30-44 — route each record to partition
``CRC32(headers[header.key]) fmod number.partitions``; a missing header or a
non-positive partition count is an error (ConnectException, :33-35, :42).
Duplicate header keys resolve last-wins via ``headers().lastWithName`` (:36) —
Spark map columns already keep one value per key (last write wins at map
construction), so ``headers[key]`` matches.

Spark expression: the routed partition is a *column* (``pmod(crc32(...), n)``)
so downstream stages can group/route on it; ``repartition_by_route=True``
additionally performs the physical shuffle the Connect runtime would do via
the broker, using ``repartition(n, routed_col)``. At scale the column form is
preferred: it composes with AQE and avoids a fixed-width shuffle.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_connect_plugins_spark.config import ConfigDef, ConfigException
from kafka_connect_plugins_spark.envelope import header_column
from kafka_connect_plugins_spark.functions.hashing import crc32_pmod
from kafka_connect_plugins_spark.operators.base import Stage


class ModifyPartition(Stage):
    config_def = (
        ConfigDef()
        .define("header.key", str, "header carrying the routing key (e.g. account_id)")
        .define("number.partitions", int, "target partition count, must be > 0")
        .define("output.column", str, "column to write the routed partition into", default="partition")
        .define("repartition.by.route", bool, "physically shuffle to the routed partition", default=False)
        .define("fail.on.missing.header", bool, "error when the header is absent", default=True)
    )

    def configure(self, config: dict[str, Any]) -> None:
        self.header_key = config["header.key"]
        self.num_partitions = config["number.partitions"]
        if self.num_partitions <= 0:
            # ModifyPartition.kt:33-35 rejects n <= 0 at apply time; we reject at build time.
            raise ConfigException(f"number.partitions must be > 0, got {self.num_partitions}")
        self.output_column = config["output.column"]
        self.repartition_by_route = config["repartition.by.route"]
        self.fail_on_missing = config["fail.on.missing.header"]

    def apply(self, df: DataFrame) -> DataFrame:
        # lastWithName over the full header multi-map when the envelope
        # carries it (duplicate keys resolve to the genuinely last entry,
        # ModifyPartition.kt:36); the map column's last-wins lookup otherwise.
        header_val = header_column(df, self.header_key)
        routed = crc32_pmod(header_val, self.num_partitions)
        if self.fail_on_missing:
            # ModifyPartition.kt:42: missing header => ConnectException. raise_error
            # fails the task exactly like the reference fails the record batch.
            routed = F.when(
                header_val.isNull(),
                F.raise_error(
                    F.concat(
                        F.lit(f"Header '{self.header_key}' is missing for offset "),
                        F.col("offset").cast("string"),
                    )
                ).cast("int"),
            ).otherwise(routed)
        out = df.withColumn(self.output_column, routed)
        if self.repartition_by_route:
            out = out.repartition(self.num_partitions, F.col(self.output_column))
        return out

    def invalid_condition(self, df: DataFrame):
        # The rows apply() would raise on (ModifyPartition.kt:42) — lets
        # Pipeline.apply_with_dlq quarantine them instead of failing the task.
        if not self.fail_on_missing:
            return None
        return header_column(df, self.header_key).isNull()
