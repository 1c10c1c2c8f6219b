"""Line-dictionary codec for source-code text.

Novel codec (no reference counterpart — fastparquet strings are PLAIN or
whole-value dictionary, writer.py:411-414): split each document on newlines
and dictionary-encode the *lines*.  Source code repeats lines massively
(imports, braces, license headers), so the per-block line dictionary plus
bit-packed codes collapses documents to a few bytes per line, at Arrow C++
speed (split / dictionary_encode / take / binary_join — no Python loops).

The line dictionary itself can optionally be FSST-compressed (flag byte) —
chosen when the dictionary is large and line-level repetition alone doesn't
saturate the win.

Block layout (little-endian):
    u32 n_rows | u8 dict_flag (0=plain,1=fsst) |
    u64 dict_len   | dict payload (PLAIN strings or FSST block)
    u32 n_lines_total | i32 row_line_offsets[n_rows+1] |
    u8 code_width  | bit-packed line codes
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import bitpack, fsst, plain


def encode(arr: pa.Array, dict_fsst: str = "auto") -> bytes:
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    n = len(arr)
    lines = pc.split_pattern(arr, "\n")          # ListArray<string>
    flat = lines.flatten()
    row_off = np.asarray(lines.offsets, dtype=np.int64)
    denc = flat.dictionary_encode()
    codes = np.asarray(denc.indices, dtype=np.int64)
    dictionary = denc.dictionary

    use_fsst = (dict_fsst == "always") or (
        dict_fsst == "auto"
        and dictionary.nbytes > 1 << 14
        and (pc.mean(pc.binary_length(dictionary)).as_py() or 0.0) >= 8.0
    )
    dict_payload = (fsst.encode(dictionary) if use_fsst
                    else plain.encode_strings(dictionary))

    width = bitpack.width_from_max(max(len(dictionary) - 1, 1))
    packed = bitpack.pack(codes.astype(np.uint64), width)

    out = bytearray()
    out.extend(np.uint32(n).tobytes())
    out.append(1 if use_fsst else 0)
    out.extend(np.uint64(len(dict_payload)).tobytes())
    out.extend(dict_payload)
    out.extend(np.uint32(len(flat)).tobytes())
    out.extend(row_off.astype("<i4").tobytes())
    out.append(width)
    out.extend(packed)
    return bytes(out)


def decode(raw: bytes) -> pa.Array:
    buf = memoryview(raw)
    n = int(np.frombuffer(buf[0:4], dtype="<u4")[0])
    use_fsst = buf[4]
    dict_len = int(np.frombuffer(buf[5:13], dtype="<u8")[0])
    pos = 13
    dict_payload = bytes(buf[pos:pos + dict_len])
    pos += dict_len
    dictionary = (fsst.decode(dict_payload) if use_fsst
                  else plain.decode_strings(dict_payload))
    n_lines = int(np.frombuffer(buf[pos:pos + 4], dtype="<u4")[0])
    pos += 4
    row_off = np.frombuffer(buf[pos:pos + 4 * (n + 1)], dtype="<i4")
    pos += 4 * (n + 1)
    width = buf[pos]
    pos += 1
    codes = bitpack.unpack(bytes(buf[pos:]), width, n_lines)
    flat = dictionary.take(pa.array(codes.astype(np.int64)))
    lines = pa.ListArray.from_arrays(pa.array(row_off, type=pa.int32()), flat)
    return pc.binary_join(lines, "\n")
