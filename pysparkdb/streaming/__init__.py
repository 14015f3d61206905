from pysparkdb.streaming.windows import (
    read_documents_stream,
    read_events_stream,
    run_to_memory,
    session_agg,
    sliding_counts,
    stateful_user_counter,
    stream_clean_documents,
    stream_dedup,
    stream_interval_join,
    stream_interval_self_join,
    tumbling_agg,
)

__all__ = [
    "read_documents_stream", "read_events_stream", "run_to_memory",
    "session_agg", "sliding_counts", "stateful_user_counter",
    "stream_clean_documents", "stream_dedup", "stream_interval_join",
    "stream_interval_self_join",
    "tumbling_agg",
]
