"""Golden tests for the SmallFloat byte315 codec and norm table.

Gold values below were derived by executing the reference algorithm
(SmallFloat.cs:146-160) by hand on IEEE-754 bit patterns — 3 mantissa bits,
zero exponent 15.
"""

import numpy as np
import pytest

from lucenenet_spark.scoring.smallfloat import (
    NORM_TABLE,
    byte315_to_float,
    doclen_to_norm_byte,
    doclen_to_norm_byte_fast,
    float_to_byte315,
)


def _java_float_to_byte315(f: float) -> int:
    """Literal scalar transcription of the reference algorithm for
    differential testing of the vectorized implementation."""
    bits = np.float32(f).view(np.int32)
    smallfloat = int(bits) >> 21
    if smallfloat <= ((63 - 15) << 3):
        return 0 if int(bits) <= 0 else 1
    if smallfloat >= ((63 - 15) << 3) + 0x100:
        return 255  # (byte)-1
    return smallfloat - ((63 - 15) << 3)


def _java_byte315_to_float(b: int) -> float:
    if b == 0:
        return 0.0
    bits = (b & 0xFF) << 21
    bits += (63 - 15) << 24
    return float(np.int32(bits).view(np.float32))


def test_roundtrip_identity_on_all_bytes():
    # decode(b) must re-encode to b for all 256 bytes (SmallFloat invariant)
    decoded = byte315_to_float(np.arange(256))
    reencoded = float_to_byte315(decoded)
    assert (reencoded == np.arange(256, dtype=np.uint8)).all()


def test_vectorized_matches_scalar_reference():
    vals = np.concatenate(
        [
            np.float32([0.0, 1e-12, 5.820766e-10, 0.125, 0.5, 1.0, 2.0, 100.0, 7.5161928e9, 1e12]),
            (np.float32(1.0) / np.sqrt(np.arange(1, 2000)).astype(np.float32)),
        ]
    )
    got = float_to_byte315(vals)
    want = np.array([_java_float_to_byte315(v) for v in vals], dtype=np.uint8)
    np.testing.assert_array_equal(got, want)


def test_decode_matches_scalar_reference():
    got = byte315_to_float(np.arange(256))
    want = np.array([_java_byte315_to_float(b) for b in range(256)], dtype=np.float32)
    np.testing.assert_array_equal(got, want)


def test_known_values():
    # epsilon region: 1.0 encodes/decodes exactly
    assert float_to_byte315(np.float32(1.0))[0] == 124
    assert byte315_to_float(124)[0] == np.float32(1.0)
    # smallest nonzero value documented in SmallFloat.cs
    assert byte315_to_float(1)[0] == pytest.approx(5.820766e-10)


def test_norm_table_is_inverse_square():
    d = byte315_to_float(np.arange(1, 256))
    np.testing.assert_array_equal(
        NORM_TABLE[1:], (np.float32(1.0) / (d * d)).astype(np.float32)
    )
    assert np.isinf(NORM_TABLE[0])  # doclen-0 sentinel


def test_doclen_to_norm_byte_monotone_and_fast_lut():
    lens = np.arange(1, 100000, 37)
    slow = doclen_to_norm_byte(lens)
    fast = doclen_to_norm_byte_fast(lens)
    np.testing.assert_array_equal(slow, fast)
    # longer docs -> smaller 1/sqrt(len) -> byte must be non-increasing
    assert (np.diff(slow.astype(np.int64)) <= 0).all()
