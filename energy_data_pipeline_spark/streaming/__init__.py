from .incremental import (
    available_now_ingest,
    dedup_stream,
    hourly_aggregate_stream,
    interval_join_stream,
    read_event_stream,
    running_watermark_stream,
    session_stream,
    upsert_stream,
)

__all__ = [
    "available_now_ingest",
    "dedup_stream",
    "hourly_aggregate_stream",
    "interval_join_stream",
    "read_event_stream",
    "running_watermark_stream",
    "session_stream",
    "upsert_stream",
]
