"""INT96 timestamp pack/unpack — legacy Impala/mr-parquet interop.

The reference WRITES int96 when asked (fastparquet writer.py:310-316:
nanos-of-day int64 + Julian day int32, little-endian, 12 bytes/value) and
converts on read (converted_types.py:159-163; speedups time shifts).
Modern engines treat INT96 as deprecated (parquet-format
Logical-Types.md), so the blockstore never EMITS it — these kernels exist
to ingest foreign int96 parquet payloads and to serve as the write-side
parity proof, both fully vectorized (no per-value struct packing like the
reference's row loop).

Layout per value: bytes [0:8) = nanoseconds within the Julian day
(int64 LE), bytes [8:12) = Julian Day Number (int32 LE).
Epoch 1970-01-01 is JDN 2440588.
"""
from __future__ import annotations

import numpy as np

JULIAN_EPOCH = 2440588  # JDN of 1970-01-01
NS_PER_DAY = 86_400_000_000_000


def timestamps_to_int96(ns: np.ndarray) -> bytes:
    """int64 epoch-nanoseconds -> packed 12-byte int96 values.

    Floor division keeps pre-epoch timestamps correct (negative ns land
    on the previous Julian day with a positive nanos-of-day remainder).
    """
    ns = np.ascontiguousarray(ns, dtype=np.int64)
    day = np.floor_divide(ns, NS_PER_DAY)
    nanos = ns - day * NS_PER_DAY
    out = np.empty((len(ns), 12), dtype=np.uint8)
    out[:, 0:8] = nanos.astype("<i8").view(np.uint8).reshape(-1, 8)
    out[:, 8:12] = (day + JULIAN_EPOCH).astype("<i4").view(
        np.uint8).reshape(-1, 4)
    return out.tobytes()


def int96_to_timestamps(buf: bytes) -> np.ndarray:
    """Packed 12-byte int96 values -> int64 epoch-nanoseconds."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size % 12:
        raise ValueError(f"int96 payload of {raw.size} bytes is not a "
                         "multiple of 12")
    raw = raw.reshape(-1, 12)
    nanos = np.ascontiguousarray(raw[:, 0:8]).view("<i8").ravel()
    day = np.ascontiguousarray(raw[:, 8:12]).view("<i4").ravel()
    return (day.astype(np.int64) - JULIAN_EPOCH) * NS_PER_DAY + nanos
