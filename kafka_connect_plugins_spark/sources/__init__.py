"""Sources: deterministic change-event synthesis and event-log readers."""

from kafka_connect_plugins_spark.sources.changelog import (
    changelog,
    expected_final_state,
)
from kafka_connect_plugins_spark.sources.json_envelope import (
    parse_json_envelope,
    read_json_envelope,
)

__all__ = [
    "changelog",
    "expected_final_state",
    "parse_json_envelope",
    "read_json_envelope",
]
