from .config import IndexConfig
from .builder import IndexBuilder, append_index, build_index, compact_index
from .storage import IndexStorage

__all__ = ["IndexConfig", "IndexBuilder", "IndexStorage", "append_index", "build_index", "compact_index"]
