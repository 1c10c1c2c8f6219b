"""Line-dictionary codec: roundtrips, edges, selector integration."""
import pyarrow as pa
import pytest

from parquet_python_spark.kernels import linedict
from parquet_python_spark.operators import encoder as enc, selector
from parquet_python_spark.sources import codegen as cg


@pytest.mark.parametrize("vals", [
    [],
    [""],
    ["a"],
    ["a\n"],
    ["\n"],
    ["\n\n\n"],
    ["x\ny\nz", "x\ny", "", "z"],
    ["same\nline", "same\nline", "same\nline"],
    ["unicode ✓\nsnowman ☃", "tabs\t\nand\nmore"],
])
def test_roundtrip_edges(vals):
    arr = pa.array(vals, type=pa.string())
    assert linedict.decode(linedict.encode(arr)).equals(arr)


@pytest.mark.parametrize("dict_fsst", ["never", "always"])
def test_roundtrip_code_table(dict_fsst):
    arr = cg.generate_arrow(0, 500)["content"].combine_chunks()
    blk = linedict.encode(arr, dict_fsst=dict_fsst)
    assert linedict.decode(blk).equals(arr)
    assert len(blk) < 0.35 * arr.nbytes


def test_selector_prefers_linedict_for_code():
    arr = cg.generate_arrow(0, 2000)["content"].combine_chunks()
    c = selector.choose(arr)
    assert c.codec_name == "linedict"


def test_block_roundtrip_with_nulls():
    arr = pa.array(["a\nb", None, "c", None, "d\ne\nf"], type=pa.string())
    blk = enc.encode_block(arr, enc.LINEDICT)
    assert enc.decode_block(blk).equals(arr)


def test_hexpack_roundtrip_and_selector():
    from parquet_python_spark.kernels import hexpack
    arr = cg.generate_arrow(0, 300)["commit"].combine_chunks()
    assert hexpack.decode(hexpack.encode(arr)).equals(arr.cast(pa.string()))
    c = selector.choose(arr)
    assert c.codec_name == "hexpack"
    blk = enc.encode_block(arr, enc.HEXPACK)
    assert len(blk) < 0.55 * arr.nbytes
    with pytest.raises(ValueError):
        hexpack.encode(pa.array(["xyz!"], type=pa.string()))
