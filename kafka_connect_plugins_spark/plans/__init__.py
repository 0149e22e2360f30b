"""Physical plans: the lake-table sink (MERGE upsert, snapshots, evolution)."""

from kafka_connect_plugins_spark.plans.lake_table import LakeTable, MergeStats
from kafka_connect_plugins_spark.plans.parallelism import spread

__all__ = ["LakeTable", "MergeStats", "spread"]
