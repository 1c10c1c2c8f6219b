"""Property-based codec fuzzing (hypothesis): every generated arrow array
must survive selector → encode_block → decode_block bit-exactly, across
dtypes, nulls, unicode, empties, and nested values.  This mirrors the
reference's randomized roundtrip style (fastparquet test_api roundtrips)
with generative inputs instead of fixed fixtures."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from parquet_python_spark.operators import encoder as enc
from parquet_python_spark.operators import selector

SETTINGS = dict(max_examples=40, deadline=None)


def _roundtrip(arr: pa.Array):
    c = selector.choose(arr)
    dec = enc.decode_block(enc.encode_block(arr, c.codec))
    assert dec.cast(arr.type).equals(arr) or dec.equals(arr), (
        c.codec_name, arr.type)


@settings(**SETTINGS)
@given(st.lists(st.one_of(st.none(),
                          st.integers(min_value=-2**63, max_value=2**63 - 1)),
                min_size=1, max_size=300))
def test_int64_roundtrip(vals):
    _roundtrip(pa.array(vals, type=pa.int64()))


@settings(**SETTINGS)
@given(st.lists(st.one_of(st.none(), st.integers(0, 2**64 - 1)),
                min_size=1, max_size=200))
def test_uint64_roundtrip(vals):
    _roundtrip(pa.array(vals, type=pa.uint64()))


@settings(**SETTINGS)
@given(st.lists(st.one_of(st.none(), st.text(max_size=40)),
                min_size=1, max_size=200))
def test_string_roundtrip(vals):
    _roundtrip(pa.array(vals, type=pa.string()))


@settings(**SETTINGS)
@given(st.lists(st.one_of(st.none(),
                          st.floats(allow_nan=False, width=64)),
                min_size=1, max_size=200))
def test_float64_roundtrip(vals):
    _roundtrip(pa.array(vals, type=pa.float64()))


@settings(**SETTINGS)
@given(st.lists(st.one_of(st.none(), st.booleans()),
                min_size=1, max_size=200))
def test_bool_roundtrip(vals):
    _roundtrip(pa.array(vals, type=pa.bool_()))


@settings(**SETTINGS)
@given(st.lists(
    st.one_of(st.none(),
              st.lists(st.one_of(st.none(),
                                 st.integers(-2**31, 2**31 - 1)),
                       max_size=20)),
    min_size=1, max_size=80))
def test_list_int_roundtrip(vals):
    _roundtrip(pa.array(vals, type=pa.list_(pa.int32())))


@settings(**SETTINGS)
@given(st.lists(
    st.one_of(st.none(),
              st.dictionaries(st.text(min_size=1, max_size=8),
                              st.one_of(st.none(),
                                        st.integers(-10**9, 10**9)),
                              max_size=6)),
    min_size=1, max_size=60))
def test_map_roundtrip(vals):
    as_items = [None if v is None else list(v.items()) for v in vals]
    _roundtrip(pa.array(as_items, type=pa.map_(pa.string(), pa.int64())))


@settings(**SETTINGS)
@given(st.lists(st.one_of(st.none(),
                          st.integers(-2**62, 2**62)),
                min_size=1, max_size=200),
       st.sampled_from([enc.PLAIN, enc.DICT, enc.BITPACK, enc.RLE_FOR,
                        enc.DELTA]))
def test_every_int_codec_roundtrip(vals, codec):
    """Not just the selected codec: every int codec must be correct on
    every input (the selector only picks the cheapest, never a wrong one)."""
    arr = pa.array(vals, type=pa.int64())
    dec = enc.decode_block(enc.encode_block(arr, codec))
    assert dec.equals(arr)


@settings(**SETTINGS)
@given(st.lists(st.one_of(st.none(), st.text(max_size=30)),
                min_size=1, max_size=120),
       st.sampled_from(["UNCOMPRESSED", "GZIP", "BZ2", "LZMA"]))
def test_string_compression_roundtrip(vals, comp_name):
    from parquet_python_spark.kernels import compression as comp

    arr = pa.array(vals, type=pa.string())
    blk = enc.encode_block(arr, enc.PLAIN, comp.resolve(comp_name))
    assert enc.decode_block(blk).equals(arr)


@settings(**SETTINGS)
@given(st.binary(min_size=1, max_size=64))
def test_corrupt_blocks_raise(junk):
    """Garbage input must raise, never return data (reference behavior:
    bad magic / truncated pages raise)."""
    if junk[:4] == enc.MAGIC:
        junk = b"XXXX" + junk[4:]
    try:
        enc.decode_block(junk)
        raised = False
    except Exception:
        raised = True
    assert raised


def _roundtrip_bits_f64(arr: pa.Array):
    """Bit-exact comparison: pa.Array.equals treats NaN != NaN, so float
    fidelity must compare the raw IEEE bits (null slots zeroed)."""
    c = selector.choose(arr)
    dec = enc.decode_block(enc.encode_block(arr, c.codec)).cast(arr.type)
    assert dec.is_null().equals(arr.is_null()), c.codec_name
    a = np.asarray(arr.fill_null(0.0).to_numpy(zero_copy_only=False))
    d = np.asarray(dec.fill_null(0.0).to_numpy(zero_copy_only=False))
    assert (a.view(np.uint64) == d.view(np.uint64)).all(), c.codec_name


@settings(**SETTINGS)
@given(st.lists(st.one_of(st.none(),
                          st.floats(allow_nan=True, allow_infinity=True)),
                min_size=1, max_size=100))
def test_float64_bit_exact_roundtrip(vals):
    _roundtrip_bits_f64(pa.array(vals, type=pa.float64()))


def test_float_nan_payload_and_negzero_preserved():
    """Regression (found by property fuzzing): the dict codec unifies
    values that compare equal but differ in bits — distinct NaN payloads
    and -0.0 vs +0.0 — so the selector must keep NaN/-0.0-bearing float
    pages on bit-exact codecs."""
    import struct

    snan = struct.unpack("d", struct.pack("Q", 0x7FF0000000000001))[0]
    for vals in ([snan, snan, float("nan")],
                 [0.0, 0.0, -0.0],
                 [snan, -0.0, 1.5, 1.5, None]):
        _roundtrip_bits_f64(pa.array(vals, type=pa.float64()))
