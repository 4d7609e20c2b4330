"""Structured Streaming surface (SURVEY.md §2.15,
docs/spark-structured-streaming.md): incremental micro-batch reads and
snapshot-committing writes over the engine's tables."""

from iceberg_demo_spark.streaming.pipeline import (
    maintain_streaming_table,
    stream_hourly_event_counts,
    stream_to_table,
)
from iceberg_demo_spark.streaming.pipeline import (
    process_table_stream,
    stream_table_appends,
)
from iceberg_demo_spark.streaming.stateful import first_seen, running_counts

__all__ = [
    "stream_to_table",
    "stream_hourly_event_counts",
    "maintain_streaming_table",
    "first_seen",
    "running_counts",
    "stream_table_appends",
    "process_table_stream",
]
