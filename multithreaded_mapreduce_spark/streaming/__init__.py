from .events import (
    run_stream_to_memory,
    sessionized_stream,
    stream_events,
    tumbling_counts_stream,
)

__all__ = [
    "run_stream_to_memory",
    "sessionized_stream",
    "stream_events",
    "tumbling_counts_stream",
]
