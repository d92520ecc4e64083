from .events import (  # noqa: F401
    read_event_stream,
    sessionized_stats,
    streaming_hourly_counts,
    windowed_event_counts,
)
