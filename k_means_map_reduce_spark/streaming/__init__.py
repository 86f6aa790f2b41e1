from .jobs import (
    stream_dedup_user_event_types,
    batch_view_click_join,
    read_events_stream,
    stream_sessionization,
    stream_sliding_windows,
    stream_static_join_enriched_counts,
    stream_stream_view_click_join,
    stream_tumbling_hourly,
    stream_user_running_stats,
)

__all__ = [
    "stream_dedup_user_event_types",
    "batch_view_click_join",
    "read_events_stream",
    "stream_sessionization",
    "stream_sliding_windows",
    "stream_static_join_enriched_counts",
    "stream_stream_view_click_join",
    "stream_tumbling_hourly",
    "stream_user_running_stats",
]
