"""Structured Streaming surface.

The reference has no streaming operators (SURVEY.md §2, "Streaming-only
operators: none") — this module is the beyond-reference scale path: the
same event analytics the batch corpus runs (time buckets, dedup, top-k)
expressed as incremental streaming plans with watermarks and state.
"""

from duckdb_cloudflare_spark.streaming.events import (  # noqa: F401
    anomaly_stream,
    conversion_stream,
    dau_registers_stream,
    dedup_stream,
    read_event_stream,
    session_windows,
    sessionize_with_state,
    transition_stream,
    windowed_event_counts,
)
