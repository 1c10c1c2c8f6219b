"""Multi-level nested types through the encode/decode pipeline (r3):
list<list<T>>, list<struct<...>>, struct-in-struct re-nesting with literal
dots, and the v2 block header (u16 dtype ids).

Reference parity: fastparquet assembles arbitrary Dremel depth on read
(cencoding.pyx:431-494); its writer cannot produce nested data at all
(writer.py:598).  We stripe nested structs Dremel-style — every leaf under
a list becomes its own array column with an element-validity bit — so leaf
codecs, projection and stats keep working per column.
"""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from pyspark.sql import functions as F

from parquet_python_spark.operators import encoder as enc
from parquet_python_spark.operators import pipeline as pl
from parquet_python_spark.operators import selector

pytestmark = pytest.mark.spark


# ------------------------------------------------------------- kernel level

def test_nested_list_block_roundtrip():
    arr = pa.array([[[1, 2], [3]], [], None, [[], [4, 5, 6]]],
                   type=pa.list_(pa.list_(pa.int64())))
    dt = enc.dtype_id_for_arrow(arr.type)
    assert dt == 2 * enc.DT_LIST_BASE + enc.DT_INT64
    assert enc.arrow_type_for_dtype_id(dt) == arr.type
    choice = selector.choose(arr)
    blk = enc.encode_block(arr, choice.codec)
    out = enc.decode_block(blk)
    assert out.equals(arr)


def test_three_level_list_roundtrip():
    t = pa.list_(pa.list_(pa.list_(pa.int32())))
    arr = pa.array([[[[1], [2, 3]]], [[[4]], []], None], type=t)
    blk = enc.encode_block(arr, selector.choose(arr).codec)
    out = enc.decode_block(blk)
    assert out.cast(t).equals(arr)


def test_list_of_map_block_roundtrip():
    t = pa.list_(pa.map_(pa.string(), pa.int64()))
    arr = pa.array([[[("a", 1)], [("b", 2), ("c", 3)]], [], None], type=t)
    dt = enc.dtype_id_for_arrow(t)
    assert enc.arrow_type_for_dtype_id(dt) == t
    blk = enc.encode_block(arr, selector.choose(arr).codec)
    out = enc.decode_block(blk)
    assert out.equals(arr)


def test_map_value_dtype_guard():
    # map values must stay primitive: the packed dtype id has 16 slots
    with pytest.raises(TypeError):
        enc._map_dtype_id(enc.DT_STRING, enc.DT_LIST_BASE + enc.DT_INT64)


def test_v2_header_u16_dtype():
    arr = pa.array([[[1]]], type=pa.list_(pa.list_(pa.int64())))
    blk = enc.encode_block(arr, selector.choose(arr).codec)
    assert blk[4] == enc.VERSION == 2
    dt = int(np.frombuffer(blk[7:9], dtype="<u2")[0])
    assert dt == 2 * enc.DT_LIST_BASE + enc.DT_INT64


# ----------------------------------------------------------- pipeline level

def _src(spark, df):
    return (df.withColumn("repo", (F.col("id") % 3).cast("string"))
            .withColumn("path", F.col("id").cast("string"))
            .withColumn("commit", F.lit("0")))


def test_list_of_list_through_pipeline(spark):
    src = _src(spark, spark.range(200).select(
        F.col("id"),
        F.array(F.array(F.col("id")),
                F.sequence(F.lit(0), F.col("id") % 3)).alias("ll")))
    blocks = pl.encode_table(src, columns=["id", "ll"],
                             target_rows=1000).persist()
    dec = pl.decode_blocks(blocks)
    a = src.select("id", F.col("ll").cast("array<array<bigint>>"))
    b = dec.select("id", F.col("ll").cast("array<array<bigint>>"))
    assert b.exceptAll(a).count() == 0 and a.exceptAll(b).count() == 0
    blocks.unpersist()


def test_list_of_struct_through_pipeline(spark):
    src = _src(spark, spark.range(300).select(
        F.col("id"),
        F.array(
            F.struct(F.lit("uid").alias("k"), F.col("id").alias("v")),
            F.struct(F.lit("sq").alias("k"), (F.col("id") * F.col("id")).alias("v")),
        ).alias("tags")))
    blocks = pl.encode_table(src, columns=["id", "tags"],
                             target_rows=1000).persist()
    dec = pl.decode_blocks(blocks)
    assert dec.schema["tags"].dataType.simpleString() == \
        "array<struct<k:string,v:bigint>>"
    a = src.select("id", F.posexplode("tags").alias("i", "t")) \
        .select("id", "i", "t.k", "t.v")
    b = dec.select("id", F.posexplode("tags").alias("i", "t")) \
        .select("id", "i", "t.k", "t.v")
    assert b.exceptAll(a).count() == 0 and a.exceptAll(b).count() == 0
    blocks.unpersist()


def test_list_of_struct_null_elements_and_lists(spark):
    """NULL lists, empty lists and NULL struct elements all survive."""
    pdf_rows = [
        (0, [{"k": "a", "v": 1}, None]),
        (1, []),
        (2, None),
        (3, [None, None]),
        (4, [{"k": None, "v": None}]),
    ]
    src = _src(spark, spark.createDataFrame(
        pdf_rows, "id long, tags array<struct<k:string,v:long>>"))
    blocks = pl.encode_table(src, columns=["id", "tags"],
                             target_rows=100).persist()
    dec = pl.decode_blocks(blocks)
    a = {r["id"]: r["tags"] for r in src.select("id", "tags").collect()}
    b = {r["id"]: r["tags"] for r in dec.select("id", "tags").collect()}
    assert a == b
    blocks.unpersist()


def test_struct_of_struct_under_list(spark):
    src = _src(spark, spark.range(50).select(
        F.col("id"),
        F.array(F.struct(
            F.struct(F.col("id").alias("x"),
                     (F.col("id") + 1).alias("y")).alias("inner"),
            F.lit("z").alias("tag"),
        )).alias("nested")))
    blocks = pl.encode_table(src, columns=["id", "nested"],
                             target_rows=100).persist()
    dec = pl.decode_blocks(blocks)
    a = src.select("id", F.explode("nested").alias("e")) \
        .select("id", "e.inner.x", "e.inner.y", "e.tag")
    b = dec.select("id", F.explode("nested").alias("e")) \
        .select("id", "e.inner.x", "e.inner.y", "e.tag")
    assert b.exceptAll(a).count() == 0 and a.exceptAll(b).count() == 0
    blocks.unpersist()
