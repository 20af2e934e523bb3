from mlvectordb_spark.streaming.events import (
    read_event_stream,
    sessionized_counts,
    stream_dedup,
    tumbling_counts,
)

__all__ = [
    "read_event_stream",
    "tumbling_counts",
    "sessionized_counts",
    "stream_dedup",
]
