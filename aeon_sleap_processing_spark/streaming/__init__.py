from .cdc_source import ManifestCDCDataSource
from .watch import (
    relay_manifested,
    stream_sessionize,
    stream_sessionize_stateful,
    stream_windowed_agg,
    watch_chunk_store,
    watch_manifested,
)

__all__ = [
    "ManifestCDCDataSource",
    "relay_manifested",
    "watch_chunk_store",
    "watch_manifested",
    "stream_sessionize",
    "stream_sessionize_stateful",
    "stream_windowed_agg",
]
