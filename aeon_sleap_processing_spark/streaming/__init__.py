"""Incremental chunk-watch mode (Structured Streaming).

Lazy re-exports (PEP 562, r16): unpickling :class:`ManifestCDCDataSource`
in a fresh Python process — the streaming-source planner runner Spark
spawns per ``start()``, and every executor data-source worker — imports
``streaming.cdc_source``, which first executes this package ``__init__``.
Eagerly importing :mod:`.watch` here dragged numpy/pandas and the sinks
module into every such process (~0.37 s measured via ``-X importtime``)
for symbols the CDC source never touches. The attributes below resolve on
first access instead; ``from aeon_sleap_processing_spark.streaming import
watch`` and every existing call site are unchanged.
"""

from typing import TYPE_CHECKING

_WATCH_EXPORTS = {
    "relay_manifested",
    "stream_sessionize",
    "stream_sessionize_stateful",
    "stream_windowed_agg",
    "watch_chunk_store",
    "watch_manifested",
}

__all__ = ["ManifestCDCDataSource", *sorted(_WATCH_EXPORTS)]

if TYPE_CHECKING:  # pragma: no cover — static analysis only
    from .cdc_source import ManifestCDCDataSource
    from .watch import (
        relay_manifested,
        stream_sessionize,
        stream_sessionize_stateful,
        stream_windowed_agg,
        watch_chunk_store,
        watch_manifested,
    )


def __getattr__(name: str):
    if name == "ManifestCDCDataSource":
        from .cdc_source import ManifestCDCDataSource

        return ManifestCDCDataSource
    if name in _WATCH_EXPORTS:
        from . import watch

        return getattr(watch, name)
    raise AttributeError(
        f"module {__name__!r} has no attribute {name!r}"
    )
