from .ingest import (
    stream_events,
    streaming_feature_agg,
    streaming_register,
    streaming_sessionize,
)

__all__ = [
    "stream_events",
    "streaming_feature_agg",
    "streaming_register",
    "streaming_sessionize",
]
