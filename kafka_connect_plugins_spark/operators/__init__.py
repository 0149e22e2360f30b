"""Operator library: the reference's eight SMTs + engine-native stages +
training-data-pipeline operators (near-dup detection, similarity search,
multimodal plumbing)."""

from kafka_connect_plugins_spark.operators import multimodal, neardup, similarity  # noqa: F401
from kafka_connect_plugins_spark.operators.asof_join import asof_join, asof_join_bucketed  # noqa: F401
from kafka_connect_plugins_spark.operators.interval_join import interval_join  # noqa: F401
from kafka_connect_plugins_spark.operators.base import Pipeline, Stage, registry, stage
from kafka_connect_plugins_spark.operators.clickhouse_flatten import ClickHouseFlatten
from kafka_connect_plugins_spark.operators.json_to_hex import JsonToHex
from kafka_connect_plugins_spark.operators.lww_dedup import LwwDedup
from kafka_connect_plugins_spark.operators.modify_partition import ModifyPartition
from kafka_connect_plugins_spark.operators.outbox_router import OutboxEventRouter
from kafka_connect_plugins_spark.operators.redact import RedactFields
from kafka_connect_plugins_spark.operators.redshift_flatten import RedshiftFlatten
from kafka_connect_plugins_spark.operators.salted_repartition import SaltedRepartition
from kafka_connect_plugins_spark.operators.slack_payload import SlackPayloadUnify
from kafka_connect_plugins_spark.operators.soft_delete_to_tombstone import SoftDeleteToTombstone
from kafka_connect_plugins_spark.operators.unquote_record_key import UnquoteRecordKey

__all__ = [
    "Pipeline",
    "Stage",
    "registry",
    "stage",
    "ClickHouseFlatten",
    "JsonToHex",
    "LwwDedup",
    "ModifyPartition",
    "OutboxEventRouter",
    "RedactFields",
    "RedshiftFlatten",
    "SaltedRepartition",
    "SlackPayloadUnify",
    "SoftDeleteToTombstone",
    "UnquoteRecordKey",
]
