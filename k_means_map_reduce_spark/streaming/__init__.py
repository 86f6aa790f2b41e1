from .jobs import (
    read_events_stream,
    stream_sessionization,
    stream_tumbling_hourly,
    stream_user_running_stats,
)

__all__ = [
    "read_events_stream",
    "stream_sessionization",
    "stream_tumbling_hourly",
    "stream_user_running_stats",
]
