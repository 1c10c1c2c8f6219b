"""E20 (INT96 timestamps) and E22 (JSON object encoding) — the two
reference surfaces previously scoped out (SURVEY §2a notes), now closed:
int96 as vectorized interop kernels (fastparquet writer.py:310-316,
converted_types.py:159-163), JSON objects as JVM to_json/from_json around
the block pipeline (fastparquet json.py:98-146)."""
import numpy as np
import pytest

from parquet_python_spark.kernels import int96


def test_int96_golden_epoch():
    # 1970-01-01T00:00:00 -> JDN 2440588, zero nanos-of-day
    packed = int96.timestamps_to_int96(np.array([0], dtype=np.int64))
    assert len(packed) == 12
    assert packed[0:8] == b"\x00" * 8
    assert int.from_bytes(packed[8:12], "little") == 2440588


def test_int96_roundtrip_vectors():
    rng = np.random.default_rng(7)
    ns = rng.integers(-(2**62), 2**62, size=10_000).astype(np.int64)
    # include exact boundaries and pre-epoch values
    ns[:6] = [0, -1, 86_400_000_000_000, -86_400_000_000_000,
              1_700_000_000_000_000_000, -1_700_000_000_000_000_000]
    back = int96.int96_to_timestamps(int96.timestamps_to_int96(ns))
    np.testing.assert_array_equal(back, ns)
    # nanos-of-day is always non-negative (floor semantics, incl. pre-epoch)
    raw = np.frombuffer(int96.timestamps_to_int96(ns),
                        dtype=np.uint8).reshape(-1, 12)
    nanos = np.ascontiguousarray(raw[:, 0:8]).view("<i8").ravel()
    assert (nanos >= 0).all() and (nanos < int96.NS_PER_DAY).all()


def test_int96_rejects_ragged_payload():
    with pytest.raises(ValueError, match="multiple of 12"):
        int96.int96_to_timestamps(b"\x00" * 13)


@pytest.mark.spark
def test_json_object_roundtrip_through_store(spark, tmp_path):
    from pyspark.sql import functions as F

    from parquet_python_spark.functions import objects
    from parquet_python_spark.operators import pipeline as pl

    src = (spark.range(500)
           .select(F.col("id").alias("doc_id"),
                   F.struct((F.col("id") % 7).alias("u"),
                            F.concat(F.lit("t"), F.col("id") % 3)
                            .alias("t")).alias("obj"))
           .withColumn("repo", (F.col("doc_id") % 4).cast("string"))
           .withColumn("path", F.col("doc_id").cast("string"))
           .withColumn("commit", F.lit("0")))
    enc_df = objects.encode_json_columns(src, ["obj"])
    assert dict(enc_df.dtypes)["obj"] == "string"
    blocks = pl.encode_table(enc_df, columns=["doc_id", "obj"]).persist()
    d = pl.decode_blocks(blocks)
    out = objects.decode_json_columns(d, {"obj": "struct<u:bigint,t:string>"})
    got = {r["doc_id"]: (r["obj"]["u"], r["obj"]["t"])
           for r in out.collect()}
    assert len(got) == 500
    assert got[10] == (3, "t1")
    assert all(got[i] == (i % 7, f"t{i % 3}") for i in range(500))


def test_bson_gates_on_missing_package(spark):
    from parquet_python_spark.functions import objects
    try:
        import bson  # noqa: F401
        pytest.skip("bson present — gate not exercisable")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="encode_json_columns"):
        objects.encode_bson_columns(spark.range(1), ["id"])


@pytest.mark.spark
def test_json_object_null_rows_roundtrip(spark):
    from pyspark.sql import functions as F

    from parquet_python_spark.functions import objects
    from parquet_python_spark.operators import pipeline as pl

    src = (spark.range(100)
           .select(F.col("id").alias("doc_id"),
                   F.when(F.col("id") % 3 == 0,
                          F.struct(F.col("id").alias("u"))).alias("obj"))
           .withColumn("repo", F.lit("r"))
           .withColumn("path", F.col("doc_id").cast("string"))
           .withColumn("commit", F.lit("0")))
    enc_df = objects.encode_json_columns(src, ["obj"])
    blocks = pl.encode_table(enc_df, columns=["doc_id", "obj"]).persist()
    out = objects.decode_json_columns(pl.decode_blocks(blocks),
                                      {"obj": "struct<u:bigint>"})
    got = {r["doc_id"]: r["obj"] for r in out.collect()}
    assert len(got) == 100
    for i in range(100):
        if i % 3 == 0:
            assert got[i]["u"] == i
        else:
            assert got[i] is None
