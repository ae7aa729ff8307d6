"""Streaming module: WINDOW VIEW / Kafka / materialized-view capabilities
(SURVEY.md §2.9) on Structured Streaming.

Reference anchors:
  - StorageWindowView tumble/hop + watermark: src/Storages/WindowView/
    StorageWindowView.cpp:86-167,517 and .h:72-89,204-229,259-265
  - time-window functions: src/Functions/FunctionsTimeWindow.cpp:670
  - Kafka source: src/Storages/Kafka/StorageKafka.cpp
  - incremental materialized view: src/Storages/StorageMaterializedView.cpp
"""

from clickhouse_23_3_19_32_lts_spark.streaming.windows import (
    hop,
    hop_window_view,
    kafka_source,
    materialized_view,
    replay_source,
    session_window_view,
    tumble,
    tumble_window_view,
)

__all__ = [
    "tumble",
    "hop",
    "tumble_window_view",
    "hop_window_view",
    "session_window_view",
    "materialized_view",
    "kafka_source",
    "replay_source",
]
