"""Sources: deterministic change-event synthesis and event-log readers."""

from kafka_connect_plugins_spark.sources.changelog import (
    changelog,
    expected_final_state,
)

__all__ = ["changelog", "expected_final_state"]
