"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline, and an LSH/IVF-bucketed
variant as the scale path.  All vector math is JVM-side (``zip_with`` +
``aggregate`` fold in double precision — deterministic left-to-right
summation an ANSI oracle can reproduce); the query side is broadcast so the
big side never shuffles.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
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
    from ._parallel import ensure_parallelism

    pairs = ensure_parallelism(
        df.select(F.col(id_col).alias("n_id"),
                  F.col(vec_col).alias("vb"))).crossJoin(
        F.broadcast(queries.select(F.col(q_id_col).alias("q_id"),
                                   F.col(vec_col).alias("va"))))
    scored = with_cosine(pairs, "va", "vb", digits=digits).where(
        F.col("q_id") != F.col("n_id"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("q_id", "n_id", "cos_sim", "rank"))


def ivf_bucket(vec, bits: int = 8, stride: int = 1):
    """Coarse quantizer: sign bits of ``bits`` dims (every ``stride``-th,
    so the code spreads over the whole vector instead of loading all its
    discrimination onto the first dims — correlated leading dims make
    first-k sign buckets skew-prone) -> bucket id.  Pure integer result —
    exactly reproducible by any engine."""
    v = vec.cast("array<double>")
    out = F.lit(0)
    for i in range(bits):
        out = out + F.when(F.element_at(v, 1 + i * stride) > 0,
                           F.lit(1 << i)).otherwise(F.lit(0))
    return out


def cosine_topk_blas(df: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     q_id_col: str = "q_id", digits: int = 3) -> DataFrame:
    """Exact brute-force top-k scored with batched BLAS — the 100-TB hot
    path.  The (small) query set collects to a normalized numpy matrix and
    ships in the UDF closure; every Arrow batch of data vectors scores as
    ONE matmul (`Mn @ Qn.T`), and each partition emits only its local
    top-k per query, so the final shuffle carries partitions x queries x k
    rows — never the scored pairs.  ~10x the per-core throughput of the
    JVM zip_with/aggregate fold (`cosine_topk`), which stays as the
    bit-deterministic oracle twin (BLAS summation order differs in the
    last float ulp)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)

    from ._parallel import ensure_parallelism

    qpdf = queries.select(q_id_col, vec_col).toPandas()
    q_ids = qpdf[q_id_col].to_numpy()
    Q = np.array(qpdf[vec_col].tolist(), dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    schema = StructType([StructField("q_id", LongType()),
                         StructField("n_id", LongType()),
                         StructField("cos_sim", DoubleType())])

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            M = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            S = Mn @ Qn.T                       # (n_data, n_queries)
            kk = min(k + 1, len(ids))           # +1 absorbs the self-match
            top = np.argpartition(-S, kk - 1, axis=0)[:kk]
            qi = np.repeat(np.arange(len(q_ids)), kk)
            di = top.T.ravel()
            yield pd.DataFrame({"q_id": q_ids[qi], "n_id": ids[di],
                                "cos_sim": np.round(S[di, qi], digits)})

    local = ensure_parallelism(
        df.select(id_col, vec_col)).mapInPandas(run, schema)
    scored = local.where(F.col("q_id") != F.col("n_id"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("q_id", "n_id", "cos_sim", "rank"))


def _probe_masks(bits: int, radius: int) -> list[int]:
    """XOR masks for all buckets within Hamming ``radius`` of a code."""
    from itertools import combinations

    masks = [0]
    for r in range(1, radius + 1):
        for combo in combinations(range(bits), r):
            m = 0
            for b in combo:
                m |= 1 << b
            masks.append(m)
    return masks


def cosine_topk_lsh(df: DataFrame, queries: DataFrame, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    q_id_col: str = "q_id", bits: int = 8,
                    n_tables: int = 8, radius: int = 2, dim: int = 64,
                    digits: int = 3) -> DataFrame:
    """Multi-table sign-LSH top-k: the recall lever single-table IVF lacks.

    Table ``t`` takes the sign bits of dims ``1 + (i*n_tables + t) % dim``
    — disjoint, interleaved dim subsets, so tables are independent codes.
    A query probes every bucket within Hamming ``radius`` in EVERY table;
    candidate (q, n) pairs are deduped on ids BEFORE vectors are fetched,
    so the expensive join ships each candidate vector once, not once per
    table hit (at 100 TB the candidate-id join is cheap; the vector fetch
    is the cost to minimize).

    Recall model (per-bit sign agreement p of true neighbours):
    per-table hit = P(Hamming(code_q, code_n) <= radius) under Binomial
    (bits, 1-p); overall = 1 - (1 - hit)^n_tables.  On the synthetic
    embeddings (isotropic: top-5 cos ~ 0.32 -> p ~ 0.6 — the WORST case
    for any LSH) the defaults give measured recall ~0.95; on real clustered
    embeddings (p ~ 0.85+) the same recall needs far fewer probes, or the
    same probes scan a much smaller candidate fraction."""
    def table_bucket(vec, t: int):
        v = vec.cast("array<double>")
        out = F.lit(0)
        for i in range(bits):
            idx = 1 + (i * n_tables + t) % dim
            out = out + F.when(F.element_at(v, idx) > 0,
                               F.lit(1 << i)).otherwise(F.lit(0))
        return out

    from ._parallel import ensure_parallelism

    df = ensure_parallelism(df)
    tb = F.posexplode(F.array(*[table_bucket(F.col(vec_col), t)
                                for t in range(n_tables)]))
    data_b = df.select(F.col(id_col).alias("n_id"),
                       tb.alias("t", "bucket"))
    masks = _probe_masks(bits, radius)
    q_b = queries.select(F.col(q_id_col).alias("q_id"),
                         tb.alias("t", "bucket"))
    q_probes = q_b.select(
        "q_id", "t",
        F.explode(F.array(*[F.col("bucket").bitwiseXOR(F.lit(m))
                            for m in masks])).alias("bucket"))
    cand = (data_b.join(F.broadcast(q_probes), ["t", "bucket"])
            .where(F.col("q_id") != F.col("n_id"))
            .select("q_id", "n_id").distinct())
    # fetch vectors once per surviving candidate pair
    pairs = (cand
             .join(df.select(F.col(id_col).alias("n_id"),
                             F.col(vec_col).alias("vb")), "n_id")
             .join(F.broadcast(queries.select(F.col(q_id_col).alias("q_id"),
                                              F.col(vec_col).alias("va"))),
                   "q_id"))
    scored = with_cosine(pairs, "va", "vb", digits=digits)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("q_id", "n_id", "cos_sim", "rank"))


def cosine_topk_ivf(df: DataFrame, queries: DataFrame, k: int = 5,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    q_id_col: str = "q_id", bits: int = 8, stride: int = 1,
                    multiprobe: bool = True, digits: int = 3) -> DataFrame:
    """IVF-style approximate top-k: only score vectors in the probed
    coarse buckets (equi-join on bucket id instead of a cross join — the
    100 TB path: bucket is also the natural partitioning key).

    ``multiprobe=True`` probes the query's own bucket plus every Hamming-1
    neighbour (1 + bits probes): sign quantization is least reliable for
    dims near zero, and single-probe falls off a recall cliff at bucket
    edges.  Each data vector lives in exactly one bucket and probe buckets
    are distinct, so no pair dedup is needed.  Scored candidates per query
    ~ (1 + bits) / 2**bits of the data — still sublinear."""
    from ._parallel import ensure_parallelism

    data = ensure_parallelism(df).select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("vb"),
        ivf_bucket(F.col(vec_col), bits, stride).alias("bucket"))
    q0 = queries.select(
        F.col(q_id_col).alias("q_id"), F.col(vec_col).alias("va"),
        ivf_bucket(F.col(vec_col), bits, stride).alias("bucket"))
    if multiprobe:
        probes = F.array(F.col("bucket"), *[
            F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(bits)])
        q0 = q0.select("q_id", "va", F.explode(probes).alias("bucket"))
    qs = F.broadcast(q0)
    pairs = data.join(qs, "bucket").where(F.col("q_id") != F.col("n_id"))
    scored = with_cosine(pairs, "va", "vb", digits=digits)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("q_id", "n_id", "cos_sim", "rank"))


def _spherical_kmeans(X, k: int, iters: int = 10, seed: int = 0):
    """Deterministic spherical k-means over row-normalized vectors (Lloyd
    with cosine assignment, fixed iteration count + seed).  Driver-side on
    a SAMPLE — never the full table; numpy only."""
    import numpy as np

    rng = np.random.default_rng(seed)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = Xn[rng.choice(len(Xn), size=min(k, len(Xn)), replace=False)].copy()
    for _ in range(iters):
        a = np.argmax(Xn @ C.T, axis=1)
        for j in range(len(C)):
            members = Xn[a == j]
            if len(members):
                C[j] = members.sum(axis=0)
        C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return C


def cosine_topk_ivf_kmeans(df: DataFrame, queries: DataFrame, k: int = 5,
                           id_col: str = "vec_id", vec_col: str = "embedding",
                           q_id_col: str = "q_id", n_centroids: int = 16,
                           n_probe: int = 4, sample_rows: int = 4096,
                           sample_mod: int = 1, seed: int = 0,
                           digits: int = 3) -> DataFrame:
    """Data-ADAPTIVE IVF: coarse buckets from sampled k-means centroids.

    The sign-bit quantizers (``cosine_topk_ivf`` / ``cosine_topk_lsh``)
    are data-independent — on real, CLUSTERED embedding corpora whole
    clusters share a sign pattern and one bucket swallows them (skewed
    bucket → skewed join task at 100 TB).  Here the coarse quantizer is
    learned from the data: a deterministic hash-thinned sample (
    ``xxhash64(id) %% sample_mod == 0``, capped at ``sample_rows`` — set
    ``sample_mod`` ≫ 1 at scale so the sample scan is cheap) collects
    driver-side, spherical k-means fits ``n_centroids``, and the (tiny)
    centroid matrix ships in the UDF closure.  Every vector is assigned
    to its max-cosine centroid by one matmul per Arrow batch; queries
    probe their ``n_probe`` nearest centroids.  The candidate join stays
    an equi-join on bucket id, and k-means balance bounds the largest
    bucket (asserted on a clustered fixture in tests/test_functions.py).
    IVF-Flat as in FAISS/Spark-ANN practice; scoring reuses the exact
    JVM cosine fold."""
    from pyspark.sql.types import ArrayType, IntegerType

    samp = df.select(vec_col)
    if sample_mod > 1:
        samp = df.where(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(sample_mod)) == 0
        ).select(vec_col)
    sample = samp.limit(sample_rows).toPandas()
    X = np.array(sample[vec_col].tolist(), dtype=np.float64)
    C = _spherical_kmeans(X, n_centroids, seed=seed)

    @F.pandas_udf(IntegerType())
    def assign(v: pd.Series) -> pd.Series:
        M = np.array(v.tolist(), dtype=np.float64)
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(Mn @ C.T, axis=1).astype(np.int32))

    @F.pandas_udf(ArrayType(IntegerType()))
    def probe(v: pd.Series) -> pd.Series:
        M = np.array(v.tolist(), dtype=np.float64)
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        S = Mn @ C.T
        p = min(n_probe, S.shape[1])
        top = np.argpartition(-S, p - 1, axis=1)[:, :p].astype(np.int32)
        return pd.Series(list(top))

    from ._parallel import ensure_parallelism

    data = ensure_parallelism(df).select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("vb"),
        assign(F.col(vec_col)).alias("bucket"))
    q0 = queries.select(
        F.col(q_id_col).alias("q_id"), F.col(vec_col).alias("va"),
        F.explode(probe(F.col(vec_col))).alias("bucket"))
    pairs = data.join(F.broadcast(q0), "bucket").where(
        F.col("q_id") != F.col("n_id"))
    scored = with_cosine(pairs, "va", "vb", digits=digits)
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("q_id", "n_id", "cos_sim", "rank"))


def near_dup_pairs(df: DataFrame, threshold: float = 0.9,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   n_blocks: int | None = None, digits: int = 4) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: every (id_a < id_b)
    with round(cosine, digits) >= threshold.

    The blocked self-join a training-data dedup pipeline runs when it must
    be EXACT (the MinHash/SimHash/LSH tiers in ``functions.dedup`` trade
    recall for sub-quadratic candidates): vectors land in ``n_blocks``
    hash blocks; each unordered block pair (i <= j) becomes one task that
    scores its cross cosine matrix with a single float64 matmul and emits
    only the pairs clearing the threshold.  O(n^2) scoring is inherent to
    exactness — what scales is the even spread: n*(B+1)/2-ish replicated
    rows shuffle once, B(B+1)/2 independent tasks, no scored pair ever
    crosses an exchange, and per-task memory is two blocks of vectors
    (pick ``n_blocks`` so n/B vectors fit; the default grows blocks with
    row count).  Thresholding on the ROUNDED value keeps the result
    reproducible by an ANSI oracle (round(list_cosine_similarity(..)),
    same digits) — unrounded boundaries differ in the last BLAS ulp.
    """
    import pyarrow as pa

    if n_blocks is None:
        n = df.count()
        n_blocks = max(1, -(-n // 4096))  # ceil: blocks of <= 4096 vectors
    B = int(n_blocks)
    # block of each vector, then replicate to every unordered pair bucket
    # (i, j): member of block b serves as side A of (b, j>=b) and side B
    # of (i<b, b) — B copies per vector, the triangle-join replication
    bid = F.pmod(F.xxhash64(F.col("_id")), F.lit(B)).cast("int")
    buckets = F.array(*[
        F.struct(F.least(F.col("_bid"), F.lit(j)).alias("bi"),
                 F.greatest(F.col("_bid"), F.lit(j)).alias("bj"))
        for j in range(B)])
    rep = (df.select(F.col(id_col).alias("_id"),
                     F.col(vec_col).cast("array<double>").alias("_v"))
           .withColumn("_bid", bid)
           .withColumn("_bkt", F.explode(F.array_distinct(buckets)))
           .select(F.col("_bkt.bi").alias("bi"), F.col("_bkt.bj").alias("bj"),
                   "_bid", "_id", "_v"))

    out_schema = ("id_a long, id_b long, cos_sim double")

    def score_bucket(key: tuple, tbl: pa.Table) -> pa.Table:
        bi = int(key[0].as_py() if hasattr(key[0], "as_py") else key[0])
        bj = int(key[1].as_py() if hasattr(key[1], "as_py") else key[1])
        ids = np.asarray(tbl["_id"].combine_chunks(), dtype=np.int64)
        bids = np.asarray(tbl["_bid"].combine_chunks(), dtype=np.int32)
        V = np.array(tbl["_v"].combine_chunks().to_pylist(), dtype=np.float64)
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        if bi == bj:  # intra-block: upper triangle of one matmul
            S = Vn @ Vn.T
            ia, ib = np.triu_indices(len(ids), k=1)
            a_ids, b_ids = ids[ia], ids[ib]
            cos = S[ia, ib]
        else:
            ma, mb = bids == bi, bids == bj
            S = Vn[ma] @ Vn[mb].T
            a_ids = np.repeat(ids[ma], int(mb.sum()))
            b_ids = np.tile(ids[mb], int(ma.sum()))
            cos = S.ravel()
        cos = np.round(cos, digits)
        keep = cos >= threshold
        a_ids, b_ids, cos = a_ids[keep], b_ids[keep], cos[keep]
        lo = np.minimum(a_ids, b_ids)
        hi = np.maximum(a_ids, b_ids)
        return pa.table({"id_a": pa.array(lo), "id_b": pa.array(hi),
                         "cos_sim": pa.array(cos)})

    return (rep.groupBy("bi", "bj")
            .applyInArrow(score_bucket, out_schema)
            .select("id_a", "id_b", "cos_sim"))
