"""Skew-aware hash repartitioning.

The reference's entire physical-distribution story is CRC32 routing
(ModifyPartition.kt:39-40, Partitioner.kt:31-48): one partition per key hash.
At 10^10-event scale a hot repo (BASELINE input is skewed by design) makes
one partition the straggler. This stage generalizes the router:

- ``salt.buckets = 1``: plain ``repartition(P, xxhash64(key))`` — same
  co-location guarantee as the reference router, better-mixing hash.
- ``salt.buckets = s > 1``: each key fans out over ``s`` sub-partitions via a
  per-row salt, bounding any key's share of a partition at ~1/s. Downstream
  per-key operators (the LWW aggregate) re-group; because the LWW aggregate
  has a map-side partial phase, the salted layout lets the partial collapse
  of a hot key happen on many cores in parallel — the classic two-phase
  skew-agg pattern.

AQE (``spark.sql.adaptive.*``) additionally rebalances post-shuffle sizes at
runtime; this stage handles the case AQE can't: a single key too hot for any
single task.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_connect_plugins_spark.config import ConfigDef, ConfigException
from kafka_connect_plugins_spark.operators.base import Stage


class SaltedRepartition(Stage):
    config_def = (
        ConfigDef()
        .define("key.columns", str, "comma-separated routing key columns")
        .define("num.partitions", int, "target shuffle partitions (0 = let AQE decide)", default=0)
        .define("salt.buckets", int, "per-key fan-out for hot keys", default=1)
    )

    def configure(self, config: dict[str, Any]) -> None:
        self.keys = [c.strip() for c in config["key.columns"].split(",") if c.strip()]
        if not self.keys:
            raise ConfigException("key.columns must name at least one column")
        self.num_partitions = config["num.partitions"]
        self.salt_buckets = config["salt.buckets"]
        if self.salt_buckets < 1:
            raise ConfigException("salt.buckets must be >= 1")

    def apply(self, df: DataFrame) -> DataFrame:
        key_cols = [F.col(c) for c in self.keys]
        if self.salt_buckets == 1:
            shuffle_key = F.xxhash64(*key_cols)
        else:
            # Deterministic per-row salt derived from the LSN when present, so
            # replays produce identical layouts (no RNG in the plan).
            salt_src = F.col("offset") if "offset" in df.columns else F.monotonically_increasing_id()
            salt = F.pmod(salt_src, F.lit(self.salt_buckets))
            shuffle_key = F.xxhash64(*key_cols, salt)
        if self.num_partitions > 0:
            return df.repartition(self.num_partitions, shuffle_key)
        return df.repartition(shuffle_key)
