"""Structured-Streaming incremental encode: arriving files → blockstore
with exactly-once part_keys; windowed metric rollup."""
import shutil

import pytest
from pyspark.sql import functions as F

from parquet_python_spark.operators import pipeline as pl
from parquet_python_spark.sources import codegen as cg
from parquet_python_spark.streaming import incremental as st

pytestmark = pytest.mark.spark


def test_stream_encode_available_now(spark, tmp_path):
    src_dir = str(tmp_path / "arriving")
    store = str(tmp_path / "store")
    # two "arrivals" of deterministic data
    a = cg.code_table(spark, 400, partitions=2)
    a.write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    q = st.stream_encode(spark, src_dir, store, schema, target_rows=200)
    q.awaitTermination(120)
    rows1 = pl.read_lineage(spark, store).agg(F.sum("n_rows")).collect()[0][0]
    assert rows1 == 400

    # decode everything back and verify fidelity
    decoded = pl.decode_blocks(pl.read_blocks(spark, store))
    res = pl.verify_roundtrip(spark.read.parquet(src_dir), decoded)
    assert res["ok"], res

    # re-running the stream over the same files must not double-encode
    shutil.rmtree(str(tmp_path / "store/_stream_checkpoint"))
    q2 = st.stream_encode(spark, src_dir, store, schema, target_rows=200)
    q2.awaitTermination(120)
    lin = pl.read_lineage(spark, store)
    dup = lin.groupBy("part_key").count().where(F.col("count") > 1).count()
    assert dup == 0, "resume anti-join must keep part_keys unique"


def test_stream_incremental_arrival_keeps_all_rows(spark, tmp_path):
    """r2 ADVICE(high): rows arriving AFTER a bucket's part completed must
    still be encoded.  Two separate stream runs over a growing directory
    (same checkpoint — the normal incremental path) must store every row."""
    src_dir = str(tmp_path / "grow")
    store = str(tmp_path / "gstore")
    full = cg.code_table(spark, 1000, partitions=2).cache()
    full.limit(600).coalesce(1).write.mode("overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    q = st.stream_encode(spark, src_dir, store, schema, target_rows=200)
    q.awaitTermination(120)
    # late arrival into buckets that already completed a generation
    full.subtract(full.limit(600)).coalesce(1).write.mode(
        "append").parquet(src_dir)
    q2 = st.stream_encode(spark, src_dir, store, schema, target_rows=200)
    q2.awaitTermination(120)

    decoded = pl.decode_blocks(pl.read_blocks(spark, store))
    res = pl.verify_roundtrip(spark.read.parquet(src_dir), decoded)
    assert res["ok"], res
    full.unpersist()


def test_windowed_metrics_batch_semantics(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = st.windowed_encode_metrics(events, window="1 day",
                                     watermark="2 days")
    pdf = out.toPandas()
    assert pdf.n_events.sum() == events.count()
    assert (pdf.window_end > pdf.window_start).all()


def test_stream_dedup_stateful(spark, tmp_path):
    """applyInPandasWithState cross-batch dedup: state (keep_id, copies)
    per content hash survives micro-batches; duplicates arriving later
    produce update rows with first_seen=0 and the ORIGINAL keep_id."""
    import pandas as pd

    from parquet_python_spark.streaming import stateful

    src_dir = str(tmp_path / "sd_src")
    ckpt = str(tmp_path / "sd_ckpt")

    batch1 = pd.DataFrame({
        "doc_id": [10, 11, 12, 13],
        "text": ["aaa", "bbb", "aaa", "ccc"],   # aaa duplicated in-batch
    })
    spark.createDataFrame(batch1).coalesce(1).write.mode(
        "overwrite").parquet(src_dir)
    schema = spark.read.parquet(src_dir).schema

    def run_once(name):
        collected = []

        def sink(batch_df, batch_id):
            collected.append(batch_df.toPandas())

        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "8").parquet(src_dir))
        q = (stateful.stream_dedup(stream).writeStream
             .foreachBatch(sink).outputMode("update")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return (pd.concat(collected, ignore_index=True) if collected
                else pd.DataFrame(columns=["text_sha", "keep_id",
                                           "n_new_copies", "first_seen"]))

    out1 = run_once("sd1")
    assert (out1.first_seen == 1).all()
    got = out1.set_index(out1.keep_id)
    assert set(out1.keep_id) == {10, 11, 13}
    assert int(out1[out1.keep_id == 10].n_new_copies.iloc[0]) == 2

    # batch 2: another copy of 'aaa' and one new content
    batch2 = pd.DataFrame({"doc_id": [20, 21], "text": ["aaa", "ddd"]})
    spark.createDataFrame(batch2).coalesce(1).write.mode(
        "append").parquet(src_dir)
    out2 = run_once("sd2")
    dup = out2[out2.first_seen == 0]
    new = out2[out2.first_seen == 1]
    assert len(dup) == 1 and int(dup.keep_id.iloc[0]) == 10, \
        "replayed content must keep the original representative"
    assert len(new) == 1 and int(new.keep_id.iloc[0]) == 21
