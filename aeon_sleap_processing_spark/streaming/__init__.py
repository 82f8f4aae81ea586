from .watch import watch_chunk_store

__all__ = ["watch_chunk_store"]
