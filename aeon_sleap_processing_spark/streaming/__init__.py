from .watch import (
    stream_sessionize,
    stream_sessionize_stateful,
    stream_windowed_agg,
    watch_chunk_store,
)

__all__ = [
    "watch_chunk_store",
    "stream_sessionize",
    "stream_sessionize_stateful",
    "stream_windowed_agg",
]
