"""Physical plans: the lake-table sink (MERGE upsert, snapshots, evolution)."""

from kafka_connect_plugins_spark.plans.lake_table import LakeTable, MergeStats
from kafka_connect_plugins_spark.plans.parallelism import spread
from kafka_connect_plugins_spark.plans.replication import (
    ensure_replica,
    export_changes_envelope,
    replicate,
)

__all__ = [
    "LakeTable",
    "MergeStats",
    "spread",
    "ensure_replica",
    "export_changes_envelope",
    "replicate",
]
