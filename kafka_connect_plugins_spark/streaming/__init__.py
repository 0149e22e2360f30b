from kafka_connect_plugins_spark.streaming.ingest import (
    CHANGELOG_VALUE_TYPE,
    StreamingIngest,
    tail_changelog,
)
from kafka_connect_plugins_spark.streaming.metrics import MetricsLog, ProgressListener
from kafka_connect_plugins_spark.streaming.stateful import (
    streaming_lww_dedup,
    windowed_event_counts,
)

__all__ = [
    "CHANGELOG_VALUE_TYPE",
    "StreamingIngest",
    "tail_changelog",
    "MetricsLog",
    "ProgressListener",
    "streaming_lww_dedup",
    "windowed_event_counts",
]
