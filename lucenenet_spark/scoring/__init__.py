from .smallfloat import float_to_byte315, byte315_to_float, NORM_TABLE, doclen_to_norm_byte
from .bm25 import BM25, CollectionStats

__all__ = [
    "float_to_byte315",
    "byte315_to_float",
    "NORM_TABLE",
    "doclen_to_norm_byte",
    "BM25",
    "CollectionStats",
]
