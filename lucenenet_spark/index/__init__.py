from .config import IndexConfig
from .builder import IndexBuilder, append_index, build_index, compact_index
from .storage import IndexStorage
from .deletes import delete_by_query, delete_by_urls, delete_docs

__all__ = ["IndexConfig", "IndexBuilder", "IndexStorage", "append_index", "build_index", "compact_index", "delete_docs", "delete_by_urls", "delete_by_query"]
