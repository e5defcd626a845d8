from go_streaming_spark.streaming.runner import (
    StreamMetricsListener,
    replay_to_memory,
    with_zero_lateness,
)
from go_streaming_spark.streaming.stateful import (
    counting_window_stream,
    counting_window_stream_tws,
    stream_limit,
)

__all__ = [
    "replay_to_memory",
    "with_zero_lateness",
    "StreamMetricsListener",
    "stream_limit",
    "counting_window_stream",
    "counting_window_stream_tws",
]
