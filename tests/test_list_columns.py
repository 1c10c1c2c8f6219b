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
