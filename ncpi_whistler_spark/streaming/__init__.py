"""Structured Streaming extensions (SURVEY.md §2.10 — capability the
reference lacks; batch twins live in the query registry q18/q19)."""

from ncpi_whistler_spark.streaming.windows import (
    hourly_counts_stream,
    read_events_stream,
    session_counts_stream,
)

__all__ = [
    "read_events_stream",
    "hourly_counts_stream",
    "session_counts_stream",
]
