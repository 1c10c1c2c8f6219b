"""BYTE_STREAM_SPLIT: transpose float bytes into per-byte planes.

Parquet encoding 9 (the reference lists it in its encodings enum,
ttypes.py:145-172, but raises NotImplementedError on read,
core.py:422-426 — this implementation exceeds reference read support).
The split is byte-identical in size; its value is that each plane
(all sign/exponent bytes together, all low-mantissa bytes together) is
far more compressible by a downstream block codec than interleaved
IEEE-754 values.  Pure numpy reshape/transpose — zero per-value work.
"""
from __future__ import annotations

import numpy as np


def split(values: np.ndarray) -> bytes:
    """Interleaved fixed-width values -> concatenated byte planes."""
    v = np.ascontiguousarray(values)
    return v.view(np.uint8).reshape(len(v), v.itemsize).T.tobytes()


def unsplit(raw: bytes, dtype: str, count: int) -> np.ndarray:
    """Byte planes -> values (inverse of :func:`split`)."""
    dt = np.dtype(dtype)
    planes = np.frombuffer(raw, dtype=np.uint8,
                           count=count * dt.itemsize)
    return np.ascontiguousarray(
        planes.reshape(dt.itemsize, count).T).view(dt).reshape(count)
