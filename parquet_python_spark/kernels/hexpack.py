"""Fixed-length hex-string packing (commit-SHA shaped columns).

No reference counterpart (fastparquet would write these PLAIN) — a
domain codec for the source-code table: a 40-char hex commit id is 20 raw
bytes.  Encode/decode are whole-buffer ``unhexlify``/``hexlify`` — memcpy
speed, ratio (len/2) / (len+4) ≈ 0.45, and trivially random-access.

Only fixed-even-length lowercase-hex columns qualify; ``encode`` validates
the whole array (vectorized) and raises ``ValueError`` otherwise — the
pipeline falls back to the selector's next choice.

Layout: u32 n | u16 str_len | packed bytes (n * str_len/2).
"""
from __future__ import annotations

import binascii

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def is_applicable(arr: pa.Array) -> bool:
    """Cheap full-column check: equal even lengths, all [0-9a-f]."""
    if len(arr) == 0:
        return False
    lens = pc.binary_length(arr)
    mm = pc.min_max(lens)
    lo, hi = mm["min"].as_py(), mm["max"].as_py()
    if lo != hi or lo == 0 or lo % 2 or lo > 65535:
        return False
    return bool(pc.all(pc.match_substring_regex(arr, r"^[0-9a-f]*$")).as_py())


def encode(arr: pa.Array) -> bytes:
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    if not is_applicable(arr):
        raise ValueError("hexpack requires fixed even-length lowercase hex")
    n = len(arr)
    str_len = pc.binary_length(arr)[0].as_py()
    # contiguous utf8 data buffer == the full hex text
    offsets = np.frombuffer(arr.buffers()[1], dtype="<i4",
                            count=arr.offset + n + 1)[arr.offset:]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[offsets[0]:offsets[-1]]
    packed = binascii.unhexlify(data.tobytes())
    return (np.uint32(n).tobytes() + np.uint16(str_len).tobytes() + packed)


def decode(raw: bytes) -> pa.Array:
    n = int(np.frombuffer(raw[:4], dtype="<u4")[0])
    str_len = int(np.frombuffer(raw[4:6], dtype="<u2")[0])
    hexed = binascii.hexlify(raw[6:6 + n * (str_len // 2)])
    offsets = (np.arange(n + 1, dtype=np.int64) * str_len).astype("<i4")
    return pa.Array.from_buffers(
        pa.string(), n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(hexed)])
