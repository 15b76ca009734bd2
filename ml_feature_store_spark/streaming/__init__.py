from .ingest import (
    stream_events,
    stream_static_enrich,
    stream_stream_join,
    streaming_dedup,
    streaming_feature_agg,
    streaming_register,
    streaming_sessionize,
)
from .stateful import streaming_running_features, streaming_session_counts

__all__ = [
    "stream_events",
    "stream_static_enrich",
    "stream_stream_join",
    "streaming_dedup",
    "streaming_feature_agg",
    "streaming_register",
    "streaming_running_features",
    "streaming_session_counts",
    "streaming_sessionize",
]
