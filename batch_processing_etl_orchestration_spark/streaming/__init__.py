"""Structured Streaming variants of the hourly feeds (SURVEY §2.9):
watermarked tumbling windows, session windows, incremental
availableNow triggers. The reference's lateness horizons (2-day /
7-day fetch lags) map to withWatermark; its cron cadence maps to
trigger(availableNow=True) runs scheduled externally."""

from batch_processing_etl_orchestration_spark.streaming.events import (
    read_events_stream,
    hourly_counts_stream,
    session_stream,
    run_stream_to_table,
)

__all__ = [
    "read_events_stream",
    "hourly_counts_stream",
    "session_stream",
    "run_stream_to_table",
]
