"""RLE / bit-packed hybrid runs (parquet-format encoding 3).

Stream layout (parquet spec, matching the reference decoder
fastparquet/cencoding.pyx:192-213 with run kernels :24-52 and :129-169):

    run*   where run = uvarint header,
           header & 1 == 0 -> RLE run:  count = header >> 1,
                              followed by one value in ceil(width/8) LE bytes
           header & 1 == 1 -> bit-packed run: groups = header >> 1,
                              followed by groups*8 values packed at ``width``

The reference *encoder* only ever emits a single bit-packed run per page
(fastparquet/writer.py:398-408) plus single RLE runs for no-null definition
levels (fastparquet/writer.py:424-434).  We improve on that with a run
chooser — maximal constant runs >= RLE_MIN_RUN become RLE runs, everything
between becomes bit-packed groups — while keeping the stream decodable by
the same hybrid grammar.

Vectorization strategy: run boundaries come from one ``np.diff`` pass; the
encoder then loops over *emitted runs* (bounded by the number of long
constant runs, not by row count) and each bit-packed region is packed with
one vectorized :func:`bitpack.pack` call.  The decoder loops over runs and
expands each with ``np.broadcast_to`` / one vectorized unpack.
"""
from __future__ import annotations

import numpy as np

from . import bitpack
from .varint import decode_uvarint, encode_uvarint

# Parquet spec suggests RLE only pays off for runs >= 8 (must be multiple of
# 8 boundary alignment is not required by the grammar, only BP counts are
# multiples of 8).
RLE_MIN_RUN = 8


def _run_starts(values: np.ndarray) -> np.ndarray:
    """Indices where a new constant run starts (always includes 0)."""
    if len(values) == 0:
        return np.zeros(0, dtype=np.int64)
    change = np.flatnonzero(values[1:] != values[:-1]) + 1
    return np.concatenate(([0], change))


def encode(values: np.ndarray, width: int) -> bytes:
    """Encode non-negative ints < 2**width as an RLE/BP hybrid stream."""
    n = len(values)
    if n == 0:
        return b""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    vbytes = max(1, (width + 7) // 8)
    out = bytearray()

    starts = _run_starts(v)
    lengths = np.diff(np.concatenate((starts, [n])))
    # Runs long enough for RLE; everything else accumulates into BP spans.
    is_rle = lengths >= RLE_MIN_RUN

    def emit_bp(lo: int, hi: int, final: bool = False) -> None:
        # Bit-packed run counts must be a multiple of 8 values.  Mid-stream
        # spans are pre-aligned by the caller (borrowing values from the
        # following RLE run); only the final span may pad — the decoder stops
        # at the true ``count`` held in the block header, so trailing pad
        # values are never materialized.
        cnt = hi - lo
        if cnt <= 0:
            return
        if cnt % 8 and not final:
            raise AssertionError("mid-stream bit-packed span must be multiple of 8")
        groups = (cnt + 7) // 8
        chunk = v[lo:hi]
        if cnt % 8:
            chunk = np.concatenate((chunk, np.full(groups * 8 - cnt, chunk[-1], dtype=np.uint64)))
        out.extend(encode_uvarint((groups << 1) | 1))
        out.extend(bitpack.pack(chunk, width))

    # Iterate only over RLE-eligible runs: on random data this loop is empty
    # (one big vectorized BP emit); on run-heavy data it is bounded by the
    # number of long runs, never by row count.
    pend_bp = 0  # start of pending bit-packed span
    for i in np.flatnonzero(is_rle):
        lo = int(starts[i])
        ln = int(lengths[i])
        # Align the pending BP span to a multiple of 8 by moving the first
        # few values of this constant run into it (they are identical, so
        # semantics are unchanged).  Skip the run if that leaves it too short.
        pad = (-(lo - pend_bp)) % 8
        if ln - pad < RLE_MIN_RUN:
            continue
        emit_bp(pend_bp, lo + pad)
        out.extend(encode_uvarint((ln - pad) << 1))
        out.extend(int(v[lo]).to_bytes(vbytes, "little"))
        pend_bp = lo + ln
    emit_bp(pend_bp, n, final=True)
    return bytes(out)


def decode(raw: bytes, width: int, count: int) -> np.ndarray:
    """Decode ``count`` values from an RLE/BP hybrid stream -> uint64."""
    out = np.empty(count, dtype=np.uint64)
    buf = memoryview(raw)
    vbytes = max(1, (width + 7) // 8)
    pos = 0
    o = 0
    while o < count:
        header, pos = decode_uvarint(buf, pos)
        if header & 1:
            groups = header >> 1
            nvals = groups * 8
            nbytes = (nvals * width + 7) // 8
            vals = bitpack.unpack(np.frombuffer(buf[pos : pos + nbytes], dtype=np.uint8), width, nvals)
            pos += nbytes
            take = min(nvals, count - o)
            out[o : o + take] = vals[:take]
            o += take
        else:
            run = header >> 1
            val = int.from_bytes(buf[pos : pos + vbytes], "little")
            pos += vbytes
            take = min(run, count - o)
            out[o : o + take] = val
            o += take
    return out
