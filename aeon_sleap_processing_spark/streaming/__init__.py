from .watch import (
    stream_sessionize,
    stream_sessionize_stateful,
    stream_windowed_agg,
    watch_chunk_store,
    watch_manifested,
)

__all__ = [
    "watch_chunk_store",
    "watch_manifested",
    "stream_sessionize",
    "stream_sessionize_stateful",
    "stream_windowed_agg",
]
