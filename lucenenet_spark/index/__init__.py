from .config import IndexConfig
from .builder import IndexBuilder, build_index
from .storage import IndexStorage

__all__ = ["IndexConfig", "IndexBuilder", "IndexStorage", "build_index"]
