"""Block compression registry (post-encoding, orthogonal to the codecs).

Mirrors the reference's registry design (fastparquet/compression.py:8-114)
with stdlib fallbacks: the reference uses cramjam for
SNAPPY/GZIP/BROTLI/LZ4/ZSTD; this container has no cramjam, so we register
what the standard library provides and gate optional libraries behind
try-imports.  Codec ids are stable in block headers.
"""
from __future__ import annotations

import bz2
import lzma
import zlib

UNCOMPRESSED = 0
GZIP = 1       # zlib container, level 1 (throughput-oriented)
BZ2 = 2
LZMA = 3
SNAPPY = 4     # optional
ZSTD = 5       # optional
LZ4 = 6        # optional

_NAMES = {
    "UNCOMPRESSED": UNCOMPRESSED, "NONE": UNCOMPRESSED,
    "GZIP": GZIP, "ZLIB": GZIP,
    "BZ2": BZ2, "LZMA": LZMA,
    "SNAPPY": SNAPPY, "ZSTD": ZSTD, "LZ4": LZ4,
}

compressors = {
    UNCOMPRESSED: lambda b: b,
    GZIP: lambda b: zlib.compress(b, 1),
    BZ2: lambda b: bz2.compress(b, 1),
    LZMA: lambda b: lzma.compress(b, preset=0),
}
decompressors = {
    UNCOMPRESSED: lambda b: b,
    GZIP: zlib.decompress,
    BZ2: bz2.decompress,
    LZMA: lzma.decompress,
}

try:  # pragma: no cover - optional
    import cramjam

    compressors[SNAPPY] = lambda b: bytes(cramjam.snappy.compress_raw(b))
    decompressors[SNAPPY] = lambda b: bytes(cramjam.snappy.decompress_raw(b))
    compressors[ZSTD] = lambda b: bytes(cramjam.zstd.compress(b))
    decompressors[ZSTD] = lambda b: bytes(cramjam.zstd.decompress(b))
    compressors[LZ4] = lambda b: bytes(cramjam.lz4.compress_block(b))
    decompressors[LZ4] = lambda b: bytes(cramjam.lz4.decompress_block(b))
except ImportError:
    pass


def resolve(name_or_id: str | int | None) -> int:
    if name_or_id is None:
        return UNCOMPRESSED
    if isinstance(name_or_id, int):
        if name_or_id not in compressors:
            raise ValueError(f"compression id {name_or_id} unavailable")
        return name_or_id
    cid = _NAMES.get(name_or_id.upper())
    if cid is None or cid not in compressors:
        raise ValueError(f"compression {name_or_id!r} unavailable")
    return cid


def compress(data: bytes, cid: int) -> bytes:
    return compressors[cid](data)


def decompress(data: bytes, cid: int) -> bytes:
    return decompressors[cid](data)
