"""Per-block Bloom filters for equality pruning.

Min/max stats cannot prune ``col == v`` on a high-cardinality unsorted
column (every block's [min, max] spans the whole domain), which is exactly
the lookup shape a 100-TB store serves constantly: fetch by content hash,
path, commit, doc id.  The parquet format solves this with per-column-chunk
split-block Bloom filters (parquet-format BloomFilter.md; the reference
predates them — fastparquet/api.py:1125-1183 prunes on stats only).  This
module is our equivalent over blockstore metadata rows:

* ``build(arr)`` runs at encode time on the DISTINCT values of a page and
  returns the filter as ``list[int64]`` words, stored in the nullable
  ``bloom`` column of the block row.  Sizing: ``BITS_PER_DISTINCT`` bits
  per distinct value rounded up to a power of two (so probe positions are
  a mask, not a mod), capped at ``MAX_BITS`` — pages too distinct to fit
  usefully store NULL and simply stay unprunable.
* probing happens entirely JVM-side at plan time: the driver hashes the
  filter LITERAL once (``probe_hashes``), and ``operators.pipeline``
  builds a Catalyst predicate over the stored words — no Python touches
  per-block data, so pruning scales with metadata rows, not store bytes.

Hash: double hashing h(i) = h1 + i*h2 (Kirsch-Mitzenmacher) over two
salted crc32s of the value's canonical bytes.  crc32 runs at C speed per
distinct value and is identical on both sides by construction.  False
positives only cost a wasted decode (the exact re-filter still runs);
false negatives are impossible because every non-null value's bits are
set from the same canonical bytes the probe uses.
"""
from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

K = 4                    # probes per value
BITS_PER_DISTINCT = 10   # ~1.2% false-positive rate at k=4
MIN_BITS = 1 << 9        # 64 B floor — tiny pages still get a real filter
MAX_BITS = 1 << 21       # 256 KiB cap; beyond it fpp makes pruning useless
# skip string pages whose average value exceeds this: equality point-
# lookup on kilobyte-long document bodies is not a realistic access path,
# and crc32-scanning them was 26% of total encode CPU (profiled r3) —
# id-like columns (paths, commits, shas, keys) stay well under the cap
MAX_AVG_LEN = 256
_SALT2 = b"\x9e\x37\x79\xb9"  # second hash stream


def _next_pow2(n: int) -> int:
    return 1 << max(int(n) - 1, 1).bit_length()


def value_bytes(v, is_string: bool) -> bytes | None:
    """Canonical bytes of one value: utf-8 for strings/binary, 8-byte
    little-endian two's-complement for integer-view dtypes (ints,
    timestamps-as-µs, dates-as-days).  None = not hashable under this
    rendering (the caller keeps the block)."""
    if v is None:
        return None
    if is_string:
        if isinstance(v, bytes):
            return v
        if isinstance(v, str):
            return v.encode("utf-8")
        return None
    try:
        return int(v).to_bytes(8, "little", signed=True)
    except (TypeError, ValueError, OverflowError):
        return None


def hash_pair(b: bytes) -> tuple[int, int]:
    """(h1, h2) for double hashing; h2 forced odd so the probe sequence
    visits K distinct positions in a power-of-two table."""
    return zlib.crc32(b), zlib.crc32(_SALT2 + b) | 1


def build(arr: pa.Array, is_string: bool) -> list[int] | None:
    """Bloom words for one page's distinct non-null values, or None when
    the page is all-null / unhashable / too distinct to filter usefully."""
    vals = arr.drop_null()
    if len(vals) == 0:
        return None
    try:
        uniq = pa.compute.unique(vals)
    except pa.ArrowNotImplementedError:
        return None
    n_distinct = len(uniq)
    if n_distinct * BITS_PER_DISTINCT > MAX_BITS:
        return None
    if is_string and uniq.nbytes > MAX_AVG_LEN * n_distinct:
        return None
    if is_string:
        try:
            items = uniq.cast(pa.large_binary()).to_pylist()
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            return None
    else:
        # integer view: timestamps/dates hash their raw int64 units
        try:
            items = uniq.cast(pa.int64()).to_pylist()
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            return None
        items = [int(x).to_bytes(8, "little", signed=True) for x in items]
    m = min(max(_next_pow2(n_distinct * BITS_PER_DISTINCT), MIN_BITS),
            MAX_BITS)
    h1 = np.fromiter((zlib.crc32(b) for b in items),
                     dtype=np.uint64, count=len(items))
    h2 = np.fromiter((zlib.crc32(_SALT2 + b) for b in items),
                     dtype=np.uint64, count=len(items)) | np.uint64(1)
    ks = np.arange(K, dtype=np.uint64)[None, :]
    pos = (h1[:, None] + ks * h2[:, None]) & np.uint64(m - 1)
    words = np.zeros(m // 64, dtype=np.uint64)
    np.bitwise_or.at(words, (pos >> np.uint64(6)).ravel(),
                     np.uint64(1) << (pos & np.uint64(63)).ravel())
    return words.view(np.int64).tolist()


def maybe_contains(words: list[int], b: bytes) -> bool:
    """Local probe (tests / driver-side checks); the production probe is
    the Catalyst expression in ``operators.pipeline._bloom_pred``."""
    m = len(words) * 64
    h1, h2 = hash_pair(b)
    w = np.asarray(words, dtype=np.int64).view(np.uint64)
    for i in range(K):
        p = (h1 + i * h2) & (m - 1)
        if not (int(w[p >> 6]) >> (p & 63)) & 1:
            return False
    return True
