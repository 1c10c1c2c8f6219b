"""ULEB128 unsigned varints and zigzag transforms.

Varints appear only in run/block *headers* (a handful per column block,
never per row), so a tiny Python loop is acceptable there; zigzag is
vectorized because it touches every value in the delta codec.

Re-creation of reference semantics:
  - read/encode_unsigned_var_int (reference: fastparquet/cencoding.pyx:172-189, 286-290)
  - zigzag_int / zigzag_long (reference: fastparquet/cencoding.pyx:511-520)
"""
from __future__ import annotations

import numpy as np


def encode_uvarint(value: int) -> bytes:
    """ULEB128-encode one non-negative int."""
    if value < 0:
        raise ValueError("uvarint requires non-negative value")
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_uvarint(buf, pos: int) -> tuple[int, int]:
    """Decode one ULEB128 int from ``buf`` at ``pos``; return (value, new_pos)."""
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def zigzag_encode(values: np.ndarray) -> np.ndarray:
    """Signed int64 -> unsigned zigzag: (n << 1) ^ (n >> 63). Vectorized."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    return ((v.astype(np.uint64) << np.uint64(1)) ^ (v >> np.int64(63)).astype(np.uint64))


def zigzag_decode(values: np.ndarray) -> np.ndarray:
    """Unsigned zigzag -> signed int64: (n >> 1) ^ -(n & 1). Vectorized."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    return ((v >> np.uint64(1)) ^ (-(v & np.uint64(1)).astype(np.int64)).astype(np.uint64)).astype(np.int64)


def zigzag_encode_scalar(n: int) -> int:
    # Python ints are arbitrary-precision two's complement: n >> 63 is 0 for
    # n >= 0 and -1 for n < 0, so the xor yields a non-negative result.
    return (n << 1) ^ (n >> 63)


def zigzag_decode_scalar(n: int) -> int:
    return (n >> 1) ^ -(n & 1)
