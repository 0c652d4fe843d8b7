from .incremental import (
    run_stream_to_batch,
    streaming_dedup_events,
    streaming_dedup_exact,
    streaming_event_counts,
    streaming_windowed_counts,
)

__all__ = [
    "run_stream_to_batch",
    "streaming_dedup_events",
    "streaming_dedup_exact",
    "streaming_event_counts",
    "streaming_windowed_counts",
]
