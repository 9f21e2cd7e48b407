from .stream_index import start_stream_indexer

__all__ = ["start_stream_indexer"]
