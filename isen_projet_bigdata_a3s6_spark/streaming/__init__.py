from .windows import (
    session_window_agg,
    sliding_window_agg,
    streaming_tumbling_counts,
    tumbling_window_agg,
)

__all__ = [
    "session_window_agg",
    "sliding_window_agg",
    "streaming_tumbling_counts",
    "tumbling_window_agg",
]
