from pysparkdb.streaming.windows import (
    read_events_stream,
    run_to_memory,
    session_agg,
    sliding_counts,
    stateful_user_counter,
    stream_dedup,
    stream_interval_self_join,
    tumbling_agg,
)

__all__ = [
    "read_events_stream", "run_to_memory", "session_agg", "sliding_counts",
    "stateful_user_counter", "stream_dedup", "stream_interval_self_join",
    "tumbling_agg",
]
