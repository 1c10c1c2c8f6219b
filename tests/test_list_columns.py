"""LIST (array) column support: kernel roundtrips + full pipeline on the
embeddings table (decode-side Dremel-assembly parity, reference
cencoding.pyx:431-494)."""
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from parquet_python_spark.operators import encoder as enc
from parquet_python_spark.operators import pipeline as pl
from parquet_python_spark.operators import selector


@pytest.mark.parametrize("arr", [
    pa.array([[1.0, 2.0], [0.5], [], None, [3.5, None, 4.0]]),
    pa.array([None, None], type=pa.list_(pa.float32())),
    pa.array([[], []], type=pa.list_(pa.int64())),
    pa.array([["a", "b"], None, ["c"]]),
    pa.array([[1, 2, 3], [4], None]),
], ids=["float-nulls", "all-null", "empty", "strings", "ints"])
def test_list_block_roundtrip(arr):
    c = selector.choose(arr)
    assert c.codec_name == "list"
    blk = enc.encode_block(arr, c.codec)
    assert enc.decode_block(blk).cast(arr.type).equals(arr)


def test_embeddings_table_roundtrip_kernel():
    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    arr = t["embedding"].combine_chunks()
    blk = enc.encode_block(arr, enc.LIST)
    assert enc.decode_block(blk).cast(arr.type).equals(arr)


@pytest.mark.spark
def test_embeddings_pipeline_roundtrip(spark):
    src = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .withColumn("repo", (F.col("vec_id") % 5).cast("string"))
           .withColumn("path", F.col("vec_id").cast("string"))
           .withColumn("commit", F.lit("0")))
    blocks = pl.encode_table(src, columns=["vec_id", "embedding", "label"])
    decoded = pl.decode_blocks(blocks)
    got = decoded.toPandas().sort_values("vec_id").reset_index(drop=True)
    want = (src.select("vec_id", "embedding", "label").toPandas()
            .sort_values("vec_id").reset_index(drop=True))
    assert got.vec_id.equals(want.vec_id)
    assert all((list(a) == list(b)) for a, b in zip(got.embedding, want.embedding))


@pytest.mark.spark
def test_overwrite_partitions(spark, tmp_path):
    from parquet_python_spark.sources import codegen as cg
    store = str(tmp_path / "store")
    df = cg.code_table(spark, 800, partitions=2)
    pl.run_encode(df, store, target_rows=300, resume=False)
    before = pl.read_lineage(spark, store).count()
    # overwrite a subset (one repo) with modified content
    sub = df.where(F.col("repo") == "stark/repo0") \
            .withColumn("content", F.concat(F.col("content"), F.lit("\nEDIT")))
    pl.overwrite_partitions(sub, store, target_rows=300)
    lin = pl.read_lineage(spark, store)
    assert lin.groupBy("part_key").count().where(F.col("count") > 1).count() == 0
    decoded = pl.decode_blocks(pl.read_blocks(spark, store))
    edited = decoded.where(F.col("content").endswith("EDIT")).count()
    assert edited == sub.count()
    assert decoded.count() == df.count()


# ---------------------------------------------------------------- MAP<k,v>

@pytest.mark.parametrize("arr", [
    pa.array([{"a": 1, "b": 2}, None, {"c": 3}, {}, {"x": None}],
             type=pa.map_(pa.string(), pa.int32())),
    pa.array([None, None], type=pa.map_(pa.string(), pa.int64())),
    pa.array([[(1, 2.5), (3, 4.5)], [], [(7, None)]],
             type=pa.map_(pa.int64(), pa.float64())),
    pa.array([[("k", "v")], [("k2", "v2"), ("k3", "v3")]],
             type=pa.map_(pa.string(), pa.string())),
], ids=["str-int-nulls", "all-null", "int-key-float", "str-str"])
def test_map_block_roundtrip(arr):
    """MAP decode parity with the reference's k/v Dremel zip
    (fastparquet core.py:620-631), one nesting level."""
    c = selector.choose(arr)
    assert c.codec_name == "map"
    blk = enc.encode_block(arr, c.codec)
    assert enc.decode_block(blk).cast(arr.type).equals(arr)


def test_map_sliced_page_roundtrip():
    big = pa.array([{"k": i, "j": i * 2} for i in range(100)],
                   type=pa.map_(pa.string(), pa.int32()))
    s = big.slice(37, 25)
    dec = enc.decode_block(enc.encode_block(s, enc.MAP))
    assert dec.equals(pa.array(s.to_pylist(), type=s.type))


def test_map_dtype_id_is_invertible():
    for key in (pa.string(), pa.int64(), pa.int32()):
        for val in (pa.int32(), pa.float64(), pa.string()):
            t = pa.map_(key, val)
            dt = enc.dtype_id_for_arrow(t)
            assert dt <= 255, "map dtype id must fit the u8 block header"
            rt = enc.arrow_type_for_dtype_id(dt)
            assert rt.key_type == key and rt.item_type == val


@pytest.mark.spark
def test_map_pipeline_roundtrip(spark, tmp_path):
    src = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
           .withColumn("props_map",
                       F.from_json("props", "map<string,int>"))
           .withColumn("repo", (F.col("user_id") % 7).cast("string"))
           .withColumn("path", F.col("event_id").cast("string"))
           .withColumn("commit", F.lit("0")))
    store = str(tmp_path / "mapstore")
    pl.run_encode(src, store, columns=["event_id", "props_map"],
                  target_rows=400, resume=False)
    dec = pl.decode_blocks(pl.read_blocks(spark, store))
    a = (dec.select("event_id", F.explode("props_map").alias("k", "v")))
    b = (src.select("event_id", F.explode("props_map").alias("k", "v")))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


# -------------------------------------------------------------- struct<...>

@pytest.mark.spark
def test_struct_pipeline_roundtrip(spark, tmp_path):
    """Struct columns flatten to dotted paths for encoding (the reference's
    flat-schema model) and re-nest on decode; a __notnull validity column
    keeps NULL structs distinct from structs of nulls."""
    src = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
           .withColumn("meta", F.when(
               F.col("event_id") % 7 != 0,
               F.struct(F.col("user_id").alias("uid"),
                        F.col("event_type").alias("etype"),
                        F.struct(F.col("value").alias("v")).alias("inner"))))
           .withColumn("repo", (F.col("user_id") % 7).cast("string"))
           .withColumn("path", F.col("event_id").cast("string"))
           .withColumn("commit", F.lit("0")))
    store = str(tmp_path / "structstore")
    pl.run_encode(src, store, columns=["event_id", "meta"],
                  target_rows=400, resume=False)
    dec = pl.decode_blocks(pl.read_blocks(spark, store))
    assert dict(dec.dtypes)["meta"].startswith("struct")
    a = dec.select("event_id", "meta")
    b = src.select("event_id", "meta")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # null structs preserved as nulls, not structs-of-nulls
    n_null = src.where(F.col("meta").isNull()).count()
    assert dec.where(F.col("meta").isNull()).count() == n_null


@pytest.mark.spark
def test_struct_projection_by_struct_name(spark, tmp_path):
    src = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
           .withColumn("meta", F.struct(F.col("user_id").alias("uid")))
           .withColumn("repo", F.lit("r"))
           .withColumn("path", F.col("event_id").cast("string"))
           .withColumn("commit", F.lit("0")))
    blocks = pl.encode_table(src, columns=["event_id", "meta"]).persist()
    out = pl.decode_blocks(blocks, columns=["meta"])
    assert out.columns == ["meta"]
    assert out.count() == src.count()
