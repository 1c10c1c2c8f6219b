"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a struct
of metadata; decode / feature-extraction run as Arrow-batched ``mapInPandas``
UDFs.  The actual media decode is STUBBED (no image/audio libraries in this
container): ``decode_image`` raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake decoder exercises the
real Spark-side plumbing — schema, batching, partitioning — end to end.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),       # image | audio | video
    StructField("mime", StringType(), True),
    StructField("payload", BinaryType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("n_frames", IntegerType(), True),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("byte_mean", IntegerType(), True),
    StructField("feat_hash", LongType(), True),
])


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded pseudo-random bytes)."""
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:  # tiny table; per-row ok in a fixture generator
                rng = np.random.default_rng(seed + int(i))
                size = 256 + int(rng.integers(0, 1024))
                rows.append(dict(
                    media_id=int(i), kind=["image", "audio", "video"][int(i) % 3],
                    mime="application/octet-stream",
                    payload=rng.integers(0, 256, size, dtype=np.uint8).tobytes(),
                    width=64, height=64, n_frames=1 + int(i) % 30,
                ))
            yield pd.DataFrame(rows)

    # bound the partition count to the row count: spark.range defaults to
    # defaultParallelism partitions, and for a small fixture table that
    # spins up a full python-worker set per mapInPandas stage for ~2 rows
    # each (measured ~10 s of pure worker dispatch on the 64-row driver
    # row); a real media table passes a larger n and keeps parallelism
    parts = max(1, min(spark.sparkContext.defaultParallelism, n // 16))
    return spark.range(n, numPartitions=parts).mapInPandas(gen, MEDIA_SCHEMA)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """STUB: real decode needs an image library not present here."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library (not in this container); "
            "pass fake=True for the deterministic stand-in")
    arr = np.frombuffer(payload, dtype=np.uint8)
    side = max(int(np.sqrt(arr.size)), 1)
    return np.resize(arr, (side, side))


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Per-media features via Arrow-batched mapInPandas.

    The whole batch is processed as ONE numpy pass: payloads concatenate
    into a flat byte buffer and per-media sums / xor-hashes come from
    ``reduceat`` over the offsets — no per-row Python (r1 looped
    decode_image per payload; when a real decoder lands, it must slot into
    this batch shape, decoding per Arrow batch, not per row).
    ``fake=False`` still routes through the stub to keep the container
    limitation explicit."""
    def run(batches):
        for pdf in batches:
            if not fake:
                decode_image(b"", fake=False)  # raises NotImplementedError
            n = len(pdf)
            payloads = pdf["payload"].to_numpy()
            lens = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                               count=n)
            flat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            starts = np.zeros(n, dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            nonzero = lens > 0
            sums = np.zeros(n, dtype=np.int64)
            feat = np.zeros(n, dtype=np.uint64)
            nz_idx = np.flatnonzero(nonzero)
            if flat.size and nz_idx.size:
                # reduceat over the starts of NONZERO segments only: with
                # empty segments dropped, each start < flat.size and every
                # reduceat segment ends exactly at the next payload's start
                # (clamping empty-segment starts instead truncated the
                # preceding payload's segment — r2 review finding)
                idx = starts[nz_idx]
                sums[nz_idx] = np.add.reduceat(flat.astype(np.int64), idx)
                feat[nz_idx] = np.bitwise_xor.reduceat(
                    flat.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15),
                    idx)
            byte_mean = np.where(nonzero, sums // np.maximum(lens, 1),
                                 0).astype(np.int32)
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "n_bytes": lens,
                "byte_mean": byte_mean,
                "feat_hash": feat.view(np.int64),
            })

    return df.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


THUMB_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("out_w", IntegerType(), False),
    StructField("out_h", IntegerType(), False),
    StructField("thumb", BinaryType(), False),
])


def resize(df: DataFrame, out_side: int = 8, fake: bool = True) -> DataFrame:
    """Thumbnail resize as an Arrow-batched ``mapInPandas`` UDF: decode →
    block-mean downsample to ``out_side``².  Mirrors how a real imaging UDF
    runs (one library decode per payload inside the batch — imaging codecs
    are inherently per-item; the batching amortizes the Python/Arrow
    transfer, and the downsample itself is whole-array numpy).  The decode
    is the documented container stub: ``fake=True`` routes through the
    deterministic stand-in so schema, batch shape and partitioning are
    exercised for real."""
    def run(batches):
        for pdf in batches:
            ids, thumbs = pdf["media_id"].to_numpy(), []
            for p in pdf["payload"].to_numpy():
                img = decode_image(p, fake=fake).astype(np.float64)
                side = img.shape[0]
                k = max(side // out_side, 1)
                crop = img[:k * out_side, :k * out_side] if side >= out_side \
                    else np.resize(img, (out_side, out_side))
                if side >= out_side:
                    crop = crop.reshape(out_side, k, out_side, k).mean((1, 3))
                thumbs.append(crop.astype(np.uint8).tobytes())
            yield pd.DataFrame({
                "media_id": ids,
                "out_w": np.full(len(ids), out_side, dtype=np.int32),
                "out_h": np.full(len(ids), out_side, dtype=np.int32),
                "thumb": thumbs,
            })

    return df.select("media_id", "payload").mapInPandas(run, THUMB_SCHEMA)


def frame_sample(df: DataFrame, every: int = 10) -> DataFrame:
    """Frame-sampling plan for video rows: JVM-side sequence expression."""
    return df.where(F.col("kind") == "video").select(
        "media_id",
        F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every)).alias("frames"),
    )
