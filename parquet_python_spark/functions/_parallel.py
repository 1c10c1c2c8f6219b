"""Input-parallelism guard for compute-heavy operators.

A small local parquet file arrives as one or two input partitions; any
operator whose map side does real per-partition work (Arrow-batched
Python, JVM fold scoring, md5 hashing) then serializes on one core until
the first shuffle.  On a production cluster the input is already split by
``spark.sql.files.maxPartitionBytes`` across executors and this is a
no-op; locally it costs one shuffle of the RAW input bytes — still far
cheaper than shuffling any derived/exploded stream.
"""
from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
