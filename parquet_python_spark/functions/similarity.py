"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline, and an LSH/IVF-bucketed
variant as the scale path.  All vector math is JVM-side (``zip_with`` +
``aggregate`` fold in double precision — deterministic left-to-right
summation an ANSI oracle can reproduce); the query side is broadcast so the
big side never shuffles.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(_dot(a, a))


def with_cosine(pairs: DataFrame, a: str = "va", b: str = "vb",
                out: str = "cos_sim", digits: int = 3) -> DataFrame:
    av, bv = F.col(a).cast("array<double>"), F.col(b).cast("array<double>")
    return pairs.withColumn(
        out, F.round(_dot(av, bv) / (_norm(av) * _norm(bv)), digits))


def cosine_topk(df: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                q_id_col: str = "q_id", digits: int = 3) -> DataFrame:
    """Exact brute-force top-k neighbours per query vector.

    ``queries``: (q_id, embedding).  Broadcast the (small) query side; each
    data partition scores locally, then one shuffle ranks per query.  Ties
    broken by neighbour id so results are total-ordered and reproducible.
    """
    pairs = df.select(F.col(id_col).alias("n_id"),
                      F.col(vec_col).alias("vb")).crossJoin(
        F.broadcast(queries.select(F.col(q_id_col).alias("q_id"),
                                   F.col(vec_col).alias("va"))))
    scored = with_cosine(pairs, "va", "vb", digits=digits).where(
        F.col("q_id") != F.col("n_id"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("q_id", "n_id", "cos_sim", "rank"))


def ivf_bucket(vec, bits: int = 8):
    """Coarse quantizer: sign bits of the first ``bits`` dims -> bucket id.
    Pure integer result — exactly reproducible by any engine."""
    v = vec.cast("array<double>")
    out = F.lit(0)
    for i in range(1, bits + 1):
        out = out + F.when(F.element_at(v, i) > 0,
                           F.lit(1 << (i - 1))).otherwise(F.lit(0))
    return out


def cosine_topk_ivf(df: DataFrame, queries: DataFrame, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    q_id_col: str = "q_id", bits: int = 8,
                    digits: int = 3) -> DataFrame:
    """IVF-style approximate top-k: only score vectors in the query's
    coarse bucket (equi-join on bucket id instead of a cross join — the
    100 TB path: bucket is also the natural partitioning key)."""
    data = df.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("vb"),
                     ivf_bucket(F.col(vec_col), bits).alias("bucket"))
    qs = F.broadcast(queries.select(
        F.col(q_id_col).alias("q_id"), F.col(vec_col).alias("va"),
        ivf_bucket(F.col(vec_col), bits).alias("bucket")))
    pairs = data.join(qs, "bucket").where(F.col("q_id") != F.col("n_id"))
    scored = with_cosine(pairs, "va", "vb", digits=digits)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("q_id", "n_id", "cos_sim", "rank"))
