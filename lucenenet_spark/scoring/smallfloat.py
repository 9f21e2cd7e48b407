"""Lossy float->byte norm quantization, behaviorally identical to the
reference's ``SmallFloat`` 3-bit-mantissa / zero-exponent-15 encoding
(reference: src/Lucene.Net/Util/SmallFloat.cs:146-160 ``SingleToByte315`` /
``Byte315ToSingle``) and the BM25 norm decode table
(src/Lucene.Net/Search/Similarities/BM25Similarity.cs:143-154).

Pure numpy — this is the scoring kernel's foundation and is golden-tested
against hand-computed values.
"""

from __future__ import annotations

import numpy as np


def float_to_byte315(f: np.ndarray | float) -> np.ndarray:
    """Quantize positive float32 -> unsigned byte (3 mantissa bits, zexp 15).

    Vectorized equivalent of the reference algorithm: take the raw IEEE-754
    bits, shift right by 21 (24-3), and rebase the exponent so that
    (63-15)<<3 maps to 0, clamping to [0, 255] with the sign/zero special
    cases.
    """
    arr = np.atleast_1d(np.asarray(f, dtype=np.float32))
    bits = arr.view(np.int32).astype(np.int64)
    smallfloat = bits >> 21
    base = (63 - 15) << 3  # 384
    out = (smallfloat - base).astype(np.int64)
    # underflow: anything <= base quantizes to 0 (if <= +0.0) or 1
    under = smallfloat <= base
    out = np.where(under, np.where(bits <= 0, 0, 1), out)
    # overflow: saturate at 255
    out = np.where(smallfloat >= base + 0x100, 255, out)
    return out.astype(np.uint8)


def byte315_to_float(b: np.ndarray | int) -> np.ndarray:
    """Inverse of :func:`float_to_byte315` (up to quantization)."""
    arr = np.atleast_1d(np.asarray(b)).astype(np.int64) & 0xFF
    bits = (arr << 21) + ((63 - 15) << 24)
    res = bits.astype(np.int32).view(np.float32).copy()
    res[arr == 0] = 0.0
    return res


# NORM_TABLE[i] = 1 / decode(i)^2 — BM25Similarity.cs:143-154. Index 0
# (zero-length field) decodes to +inf in the reference (1/0); keep that.
with np.errstate(divide="ignore"):
    _decoded = byte315_to_float(np.arange(256))
    NORM_TABLE: np.ndarray = (
        np.float32(1.0) / (_decoded * _decoded)
    ).astype(np.float32)


def doclen_to_norm_byte(doclen: np.ndarray | int) -> np.ndarray:
    """norm byte for a field of ``doclen`` tokens: byte315(1/sqrt(doclen)).

    Reference: BM25Similarity.ComputeNorm (BM25Similarity.cs:156-160) with
    boost=1 and discountOverlaps (standard chain emits no overlaps, so
    doclen is simply the post-stopword token count — SURVEY.md §2.1).
    """
    arr = np.atleast_1d(np.asarray(doclen, dtype=np.float64))
    with np.errstate(divide="ignore"):
        f = (np.float32(1.0) / np.sqrt(arr).astype(np.float32)).astype(np.float32)
    return float_to_byte315(f)


# Small lookup: norm byte for doclens 0..65535 precomputed (doclen->byte is a
# pure function; build-side uses this table for O(1) vectorized lookup, with
# the formula as fallback for pathological doclens).
_NORM_BYTE_LUT = doclen_to_norm_byte(np.arange(65536))


def doclen_to_norm_byte_fast(doclen: np.ndarray) -> np.ndarray:
    arr = np.asarray(doclen, dtype=np.int64)
    small = arr < 65536
    if small.all():
        return _NORM_BYTE_LUT[arr]
    out = np.empty(arr.shape, dtype=np.uint8)
    out[small] = _NORM_BYTE_LUT[arr[small]]
    out[~small] = doclen_to_norm_byte(arr[~small])
    return out
