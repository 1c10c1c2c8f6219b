"""Dictionary encoding (parquet RLE_DICTIONARY semantics).

Re-creates the reference's categorical path — dict page of PLAIN-encoded
labels + a bit-width byte + RLE/BP-hybrid codes
(fastparquet/writer.py:398-408 encode, :601-631 dict-page emission;
fastparquet/core.py:183-198 dict-page decode, :374-404 de-reference) — with
two improvements: ``pd.factorize`` builds the dictionary per block (the
reference requires a pre-made pandas categorical), and codes go through our
run-chooser hybrid (the reference emits one bit-packed run only,
writer.py:398-408).

Block layout:
    uvarint n_labels | label block (PLAIN fixed or string layout) |
    uint8 bit_width | RLE/BP hybrid codes
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from . import bitpack, plain, rle
from .varint import decode_uvarint, encode_uvarint


def encode_string(arr: pa.Array) -> bytes:
    """Dictionary-encode an Arrow string or binary array (non-null)."""
    enc = arr.dictionary_encode()
    codes = np.asarray(enc.indices, dtype=np.int64)
    labels = enc.dictionary
    return _assemble(plain.encode_strings(labels), codes, len(labels))


def encode_fixed(values: np.ndarray) -> bytes:
    """Dictionary-encode a fixed-width numpy array.

    ``use_na_sentinel=False``: float NaN must become a REGULAR dictionary
    label — the default factorize maps NaN to code -1 and drops it from
    the uniques, which corrupts any NaN-bearing float block (the -1 wraps
    to 2^64-1 in the unsigned code stream)."""
    codes, uniques = pd.factorize(values, sort=False, use_na_sentinel=False)
    return _assemble(plain.encode_fixed(np.asarray(uniques, dtype=values.dtype)), codes.astype(np.int64), len(uniques))


def _assemble(label_block: bytes, codes: np.ndarray, n_labels: int) -> bytes:
    width = bitpack.width_from_max(max(n_labels - 1, 0))
    out = bytearray()
    out.extend(encode_uvarint(n_labels))
    out.extend(encode_uvarint(len(label_block)))
    out.extend(label_block)
    out.append(width)
    out.extend(rle.encode(codes.astype(np.uint64), width))
    return bytes(out)


def decode_string(raw: bytes, count: int, binary: bool = False) -> pa.Array:
    labels, codes = _split(raw, count, string=True, binary=binary)
    # Fancy-indexing de-reference (reference: core.py:374-404 ``dic[out]``)
    # stays in Arrow: build a DictionaryArray then flatten.
    idx = pa.array(codes.astype(np.int32))
    target = pa.binary() if binary else pa.string()
    return pa.DictionaryArray.from_arrays(idx, labels).cast(target)


def decode_fixed(raw: bytes, dtype: str, count: int) -> np.ndarray:
    labels, codes = _split(raw, count, string=False, dtype=dtype)
    return labels[codes]


def _split(raw: bytes, count: int, string: bool, dtype: str | None = None, binary: bool = False):
    pos = 0
    n_labels, pos = decode_uvarint(raw, pos)
    blk_len, pos = decode_uvarint(raw, pos)
    label_block = raw[pos : pos + blk_len]
    pos += blk_len
    width = raw[pos]
    pos += 1
    codes = rle.decode(raw[pos:], width, count).astype(np.int64)
    if string:
        labels = plain.decode_strings(label_block, binary=binary)
    else:
        labels = plain.decode_fixed(label_block, dtype, n_labels)
    return labels, codes
