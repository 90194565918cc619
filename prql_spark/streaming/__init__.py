from prql_spark.streaming import pipeline
from prql_spark.streaming.pipeline import (
    dedup_streaming,
    hourly_rollup,
    interval_join,
    read_events_stream,
    run_stream_to_memory,
    sessionize,
    sessionize_streaming,
)

__all__ = [
    "dedup_streaming",
    "hourly_rollup",
    "interval_join",
    "pipeline",
    "read_events_stream",
    "run_stream_to_memory",
    "sessionize",
    "sessionize_streaming",
]
