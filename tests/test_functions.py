"""Behavioral tests for dedup / similarity / text / multimodal operators
(constructed duplicates — the synthetic documents corpus has none)."""
import pytest
from pyspark.sql import functions as F

from parquet_python_spark.functions import (dedup, multimodal, profile,
                                            sampling, similarity, text)

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the old river bank "
    rows = [
        (0, base * 5),
        (1, base * 5),                                   # exact dup of 0
        (2, base * 5 + "with one extra tail sentence"),  # near dup of 0
        (3, "completely different content about spark shuffles and codecs "
            "partitioning salting lineage resume blocks " * 4),
        (4, "another unrelated document mentioning embeddings vectors and "
            "cosine similarity search with buckets " * 4),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(spark, docs):
    groups = dedup.exact_dedup_groups(docs).toPandas()
    assert len(groups) == 4  # 5 docs, one exact pair
    dup = groups[groups.n_copies == 2]
    assert len(dup) == 1 and dup.iloc[0]["keep_id"] == 0
    kept = dedup.dedup_exact(docs).toPandas()
    assert sorted(kept.doc_id) == [0, 2, 3, 4]


def test_jaccard_finds_near_dups(spark, docs):
    pairs = dedup.jaccard_pairs(docs, tau=0.5, docfreq_cap=None).toPandas()
    got = {tuple(x) for x in pairs[["a", "b"]].to_numpy()}
    assert (0, 1) in got and (0, 2) in got and (1, 2) in got
    assert not any({a, b} & {3, 4} and {a, b} & {0, 1, 2} for a, b in got)


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = dedup.minhash_lsh_pairs(docs, tau=0.5, docfreq_cap=None).toPandas()
    got = {tuple(x) for x in pairs[["a", "b"]].to_numpy()}
    assert (0, 1) in got
    est = pairs.set_index(["a", "b"])["est_jaccard"]
    assert est[(0, 1)] == 1.0


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, "en" if i % 10 < 6 else ("fr" if i % 10 < 8 else "zh"))
            for i in range(2000)]
    return spark.createDataFrame(rows, ["doc_id", "lang"])


def test_sample_stratified_deterministic_and_rated(spark, corpus):
    out1 = sampling.sample_stratified(corpus, {"en": 0.5, "fr": 0.1},
                                      "lang", "doc_id")
    a = sorted(r["doc_id"] for r in out1.collect())
    b = sorted(r["doc_id"] for r in out1.collect())  # re-run: retry-stable
    assert a == b and len(a) > 0
    by = {r["lang"]: r["n"] for r in
          out1.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert "zh" not in by                      # default_rate=0 drops
    assert abs(by["en"] / 1200 - 0.5) < 0.08   # hash-uniformity tolerance
    assert abs(by["fr"] / 400 - 0.1) < 0.08


def test_sample_stratified_matches_sql_twin(spark, corpus):
    import duckdb
    pdf = corpus.toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    sql = sampling.sample_stratified_sql(
        "docs", {"en": 0.37, "fr": 0.9}, "lang", "doc_id",
        columns="doc_id, lang")
    want = set(con.sql(sql).df()["doc_id"])
    got = {r["doc_id"] for r in sampling.sample_stratified(
        corpus, {"en": 0.37, "fr": 0.9}, "lang", "doc_id").collect()}
    assert got == want


def test_mix_proportions_hits_targets(spark, corpus):
    targets = {"en": 0.3, "fr": 0.4, "zh": 0.3}
    out = sampling.mix_proportions(corpus, targets, "lang", "doc_id")
    by = {r["lang"]: r["n"] for r in
          out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # fr is the binding stratum (400 rows / 0.4 target = 1000): kept whole
    assert by["fr"] == 400
    total = sum(by.values())
    for s, t in targets.items():
        assert abs(by[s] / total - t) < 0.05


def test_top_k_by_two_phase_equals_single_window(spark, corpus):
    from pyspark.sql import Window
    scored = corpus.withColumn(
        "score", F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(997)))
    got = sampling.top_k_by(scored, 7, "lang", [F.desc("score")],
                            salts=5).collect()
    w = Window.partitionBy("lang").orderBy(F.desc("score"), F.asc("doc_id"))
    want = (scored.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= 7).collect())
    key = lambda r: (r["lang"], r["rnk"], r["doc_id"])
    assert sorted(map(key, got)) == sorted(map(key, want))
    assert len(got) == 21  # 3 langs x 7


def test_mix_rates_unknown_stratum_raises(spark, corpus):
    with pytest.raises(ValueError, match="no rows"):
        sampling.mix_proportions(corpus, {"en": 0.5, "xx": 0.5},
                                 "lang", "doc_id")


def test_pack_sequences_invariants(spark):
    rows = [(i, "en", "tok " * (50 + 7 * i)) for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = sampling.pack_sequences(df, budget=100).orderBy("doc_id").collect()
    cum = 0
    for r in out:
        assert r["seq_first"] == cum // 100          # starts where prev ended
        assert r["seq_offset"] == cum % 100
        cum += r["n_tokens"]
        assert r["seq_last"] == max(r["seq_first"], (cum - 1) // 100)
    # budget exceeded somewhere → at least one doc straddles a cut
    assert any(r["seq_last"] > r["seq_first"] for r in out)


def test_profile_counts_nulls_and_distincts(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (4, "b")], ["id", "s"])
    got = {r["column"]: r for r in profile.profile(df).collect()}
    s = got["s"]
    assert (s["n_rows"], s["n_null"], s["n_distinct"]) == (4, 1, 2)
    assert (s["min_str"], s["max_str"]) == ("a", "b")
    assert got["id"]["n_distinct"] == 4 and got["id"]["n_null"] == 0


def test_dedup_paragraphs_keeps_first_occurrence(spark):
    boiler = "subscribe to our newsletter"
    df = spark.createDataFrame(
        [(1, ["unique alpha", boiler, "unique beta"]),
         (2, [boiler, "unique gamma", boiler]),      # cross- AND within-doc dup
         (3, [boiler])],                             # nothing survives
        ["doc_id", "paras"])
    out = {r["doc_id"]: r for r in dedup.dedup_paragraphs(df).collect()}
    assert out[1]["text_dedup"] == f"unique alpha\n\n{boiler}\n\nunique beta"
    assert (out[1]["n_total"], out[1]["n_kept"]) == (3, 3)
    assert out[2]["text_dedup"] == "unique gamma"
    assert (out[2]["n_total"], out[2]["n_kept"]) == (3, 1)
    assert 3 not in out                              # fully-duplicate doc gone


def test_chunk_paragraphs_shapes(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(19))), (2, ""), (3, "one two")],
        ["doc_id", "text"])
    got = {r["doc_id"]: r["paras"]
           for r in dedup.chunk_paragraphs(df, n=8).collect()}
    assert len(got[1]) == 3 and got[1][0].count(" ") == 7   # 8+8+3 tokens
    assert got[1][2] == "w16 w17 w18"
    assert got[2] == [] and got[3] == ["one two"]


def test_contamination_flags_leaked_eval_text(spark):
    bench = ("what is the capital of france paris is the capital and "
             "largest city of france")
    corpus = spark.createDataFrame(
        [(1, "intro text " + bench + " trailing commentary"),   # verbatim leak
         (2, "a completely unrelated document about spark shuffles and "
             "partition skew in distributed joins"),
         (3, "short")],
        ["doc_id", "text"])
    eval_df = spark.createDataFrame([(100, bench)], ["doc_id", "text"])
    got = {r["doc_id"]: r["n_hits"]
           for r in dedup.contamination(corpus, eval_df, n=5).collect()}
    assert 1 in got and got[1] >= 5
    assert 2 not in got and 3 not in got


def test_dedup_clusters_transitive(spark):
    # chain a-b-c (a,c never directly paired), clique {p,q,r}, pair {x,y}:
    # components must be resolved transitively, canonical id = min doc_id.
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("p", "q"), ("q", "r"), ("p", "r"),
         ("x", "y")], ["a", "b"])
    got = {(r["doc_id"], r["cluster_id"])
           for r in dedup.dedup_clusters(pairs).collect()}
    assert got == {("a", "a"), ("b", "a"), ("c", "a"),
                   ("p", "p"), ("q", "p"), ("r", "p"),
                   ("x", "x"), ("y", "x")}


def test_dedup_clusters_long_chain(spark):
    # a 9-hop path exercises multi-round propagation + checkpoint lineage
    ids = [f"v{i:02d}" for i in range(10)]
    pairs = spark.createDataFrame(
        list(zip(ids[1:], ids[:-1])), ["a", "b"])  # reversed order on purpose
    out = dedup.dedup_clusters(pairs).collect()
    assert {r["cluster_id"] for r in out} == {"v00"}
    assert len(out) == 10


def test_simhash_near_pairs(spark, docs):
    pairs = dedup.simhash_near_pairs(docs, max_hamming=3).toPandas()
    got = {tuple(x) for x in pairs[["a", "b"]].to_numpy()}
    assert (0, 1) in got
    assert pairs.set_index(["a", "b"])["hamming"][(0, 1)] == 0


def test_winnow_fingerprints_overlap(spark, docs):
    fp = text.winnow_fingerprints(docs).toPandas()
    by_doc = fp.groupby("doc_id")["fp"].apply(set)
    assert by_doc[0] == by_doc[1]
    assert not (by_doc[0] & by_doc[3])


def test_cosine_topk_exact_neighbor(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), "embedding")
    top = similarity.cosine_topk(emb, q, k=3).toPandas()
    assert set(top.q_id) == {0, 1, 2}
    assert (top.groupby("q_id").size() == 3).all()
    assert (top.cos_sim <= 1.0).all() and (top.cos_sim >= -1.0).all()


def test_ivf_is_subset_of_bucket(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), "embedding")
    top = similarity.cosine_topk_ivf(emb, q, k=3, bits=8).toPandas()
    assert (top.groupby("q_id").size() <= 3).all()


def test_blas_topk_matches_fold(spark):
    """The BLAS-batched scorer must select the same neighbours as the
    JVM-fold oracle twin (ranking happens on round(cos, 3), so the two
    summation orders agree away from 5e-4 boundaries)."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), "embedding")
    fold = similarity.cosine_topk(emb, q, k=5).toPandas()
    blas = similarity.cosine_topk_blas(emb, q, k=5).toPandas()
    key = ["q_id", "n_id", "rank"]
    a = fold.sort_values(key, ignore_index=True)
    b = blas.sort_values(key, ignore_index=True)
    assert a[key].equals(b[key])
    assert (a.cos_sim - b.cos_sim).abs().max() <= 1e-9


def test_lsh_multitable_recall(spark):
    """Multi-table LSH (8 dim-interleaved tables, Hamming<=2 probes) must
    reach recall@5 >= 0.9 vs brute force at sf0.01.  The synthetic
    embeddings are ISOTROPIC (top-5 cos ~ 0.32, per-bit sign agreement
    ~0.6) — the worst case for any LSH — so this bound transfers to real
    clustered embeddings with margin.  r1's single-probe IVF measured
    recall 0.03 here; multi-probe alone 0.13."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("q_id"), "embedding")
    bf = similarity.cosine_topk(emb, q, k=5).toPandas()
    lsh = similarity.cosine_topk_lsh(emb, q, k=5, bits=8, n_tables=8,
                                     radius=2).toPandas()
    truth = set(map(tuple, bf[["q_id", "n_id"]].to_numpy()))
    got = set(map(tuple, lsh[["q_id", "n_id"]].to_numpy()))
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, f"recall@5 = {recall:.3f}"
    # multi-probe IVF must strictly improve on single-probe (cheap tier)
    ivf_m = similarity.cosine_topk_ivf(emb, q, k=5, bits=8, stride=8,
                                       multiprobe=True).toPandas()
    ivf_s = similarity.cosine_topk_ivf(emb, q, k=5, bits=8, stride=8,
                                       multiprobe=False).toPandas()
    got_m = set(map(tuple, ivf_m[["q_id", "n_id"]].to_numpy()))
    got_s = set(map(tuple, ivf_s[["q_id", "n_id"]].to_numpy()))
    assert len(truth & got_m) >= len(truth & got_s)


def test_multimodal_stub(spark):
    media = multimodal.synthetic_media(spark, 12)
    feats = multimodal.extract_features(media, fake=True).toPandas()
    assert len(feats) == 12
    assert (feats.n_bytes > 0).all()
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"xx", fake=False)
    frames = multimodal.frame_sample(media, every=10).toPandas()
    assert (frames.frames.str.len() >= 1).all()


def test_multimodal_resize_deterministic(spark):
    media = multimodal.synthetic_media(spark, 12)
    t1 = multimodal.resize(media, out_side=8).toPandas().sort_values("media_id")
    t2 = multimodal.resize(media, out_side=8).toPandas().sort_values("media_id")
    assert len(t1) == 12
    assert (t1.thumb.str.len() == 64).all()          # 8x8 uint8
    assert list(t1.thumb) == list(t2.thumb)          # deterministic
    # block-mean of the fake decode, verified for one payload driver-side
    import numpy as np
    row = t1.iloc[0]
    payload = media.toPandas().set_index("media_id").loc[row.media_id, "payload"]
    img = multimodal.decode_image(bytes(payload), fake=True).astype(np.float64)
    k = max(img.shape[0] // 8, 1)
    want = (img[:k * 8, :k * 8].reshape(8, k, 8, k).mean((1, 3))
            .astype(np.uint8).tobytes())
    assert bytes(row.thumb) == want


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [(0, "#include <stdio.h>"), (1, "import numpy"), (2, "func main()"),
         (3, "plain words only")], ["doc_id", "text"])
    got = text.lang_id(df).toPandas().set_index("doc_id")["pred_lang"]
    assert got[0] == "c" and got[1] == "python" and got[2] == "go"
    assert got[3] == "unknown"


def test_redact_rules(spark):
    rows = [(0, "mail me at a.b+c@example.com or visit https://x.io/p?q=1 "
                "tel 12345678 short 123"),
            (1, "clean text")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = text.redact(df).toPandas().set_index("doc_id")
    assert out.loc[0, "redacted"] == ("mail me at <EMAIL> or visit <URL> "
                                      "tel <NUM> short 123")
    assert bool(out.loc[0, "changed"]) and not bool(out.loc[1, "changed"])


def test_multimodal_trailing_empty_payload(spark):
    """r2 ADVICE(medium): an empty payload at the batch tail must not
    truncate the preceding payload's reduceat segment."""
    import pandas as pd

    pdf = pd.DataFrame({
        "media_id": [0, 1, 2, 3],
        "payload": [b"\x01\x02\x04", b"", b"\x05", b""],
    })
    df = spark.createDataFrame(pdf)
    feats = (multimodal.extract_features(df, fake=True)
             .toPandas().set_index("media_id").sort_index())
    assert feats.loc[0, "n_bytes"] == 3
    assert feats.loc[0, "byte_mean"] == (1 + 2 + 4) // 3
    assert feats.loc[1, "n_bytes"] == 0 and feats.loc[1, "feat_hash"] == 0
    assert feats.loc[2, "byte_mean"] == 5
    assert feats.loc[3, "n_bytes"] == 0 and feats.loc[3, "feat_hash"] == 0


def test_kmeans_ivf_clustered_recall_and_balance(spark, rng):
    """VERDICT-r2 item 8: the sign-bit quantizers are data-independent and
    skew on CLUSTERED corpora (real embeddings cluster); the sampled
    k-means IVF must reach recall@5 >= 0.9 on a clustered NON-isotropic
    fixture while keeping its largest bucket <= 4/n_centroids of the data
    (the 100-TB join-task balance bound)."""
    import numpy as np
    import pandas as pd

    dim, n_clusters, per = 64, 8, 375
    centers = rng.normal(size=(n_clusters, dim)) * 3.0
    X = np.concatenate([
        centers[c] + rng.normal(size=(per, dim)) for c in range(n_clusters)])
    pdf = pd.DataFrame({"vec_id": np.arange(len(X), dtype=np.int64),
                        "embedding": [r.astype(np.float32) for r in X]})
    emb = spark.createDataFrame(pdf)
    q = emb.where(F.col("vec_id") % 250 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding")
    bf = similarity.cosine_topk(emb, q, k=5).toPandas()
    km = similarity.cosine_topk_ivf_kmeans(emb, q, k=5, n_centroids=16,
                                           n_probe=4).toPandas()
    truth = set(map(tuple, bf[["q_id", "n_id"]].to_numpy()))
    got = set(map(tuple, km[["q_id", "n_id"]].to_numpy()))
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, f"kmeans-IVF recall@5 = {recall:.3f}"

    # bucket balance: learned centroids split the clusters; no bucket may
    # swallow more than 4/n_centroids of the corpus
    sample = emb.select("embedding").limit(4096).toPandas()
    C = similarity._spherical_kmeans(
        np.array(sample["embedding"].tolist(), dtype=np.float64), 16)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    frac = np.bincount(np.argmax(Xn @ C.T, axis=1),
                       minlength=16).max() / len(X)
    assert frac <= 4 / 16, f"max bucket fraction {frac:.3f}"

    # and the motivating skew, scale-free (max_frac x n_buckets = load
    # imbalance of the biggest join task vs a uniform split): whole
    # clusters share a sign pattern, so the data-independent quantizer's
    # imbalance explodes while learned centroids stay near-uniform
    sign_codes = (np.packbits((X[:, :8] > 0), axis=1, bitorder="little")
                  .ravel())
    sign_imbal = np.bincount(sign_codes, minlength=256).max() / len(X) * 256
    km_imbal = frac * 16
    assert km_imbal < sign_imbal / 4, (km_imbal, sign_imbal)


def test_near_dup_exact_matches_bruteforce(spark, rng):
    """Blocked-BLAS near-dup must equal the all-pairs JVM fold: same pair
    set, same rounded cosines, each pair emitted exactly once even when a
    pair's members land in different hash blocks."""
    n, d = 120, 16
    V = rng.normal(size=(n, d))
    # plant near-duplicates across ids that hash to different blocks
    V[7] = V[3] + rng.normal(scale=0.05, size=d)
    V[101] = V[44] + rng.normal(scale=0.05, size=d)
    df = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(n)],
        "vec_id long, embedding array<float>")
    got = similarity.near_dup_pairs(df, threshold=0.8, n_blocks=5,
                                    digits=4).toPandas()
    # brute force via the deterministic JVM fold
    a = df.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = df.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    ref = (similarity.with_cosine(pairs, "va", "vb", digits=4)
           .where(F.col("cos_sim") >= 0.8)
           .select("id_a", "id_b", "cos_sim").toPandas())
    got_set = {(r.id_a, r.id_b, r.cos_sim) for r in got.itertuples()}
    ref_set = {(r.id_a, r.id_b, r.cos_sim) for r in ref.itertuples()}
    assert len(got) == len(got_set)  # no duplicate emission
    assert got_set == ref_set
    assert {(3, 7), (44, 101)} <= {(a_, b_) for a_, b_, _ in got_set}


def test_strip_boilerplate_semantics(spark):
    from parquet_python_spark.functions import text as T

    hdr = "// SPDX-License-Identifier: MIT"
    docs = spark.createDataFrame(
        [(0, hdr + "\nalpha\nbeta"),
         (1, hdr + "\ngamma"),
         (2, hdr + "\ndelta\nalpha"),
         (3, "unique only")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["clean_text"], r["n_kept"])
           for r in T.strip_boilerplate(docs, min_docs=3).collect()}
    # the header appears in 3 distinct docs -> stripped everywhere;
    # 'alpha' appears in only 2 docs -> kept; order preserved
    assert got[0] == ("alpha\nbeta", 2)
    assert got[1] == ("gamma", 1)
    assert got[2] == ("delta\nalpha", 2)
    assert got[3] == ("unique only", 1)


def test_strip_boilerplate_all_boilerplate_doc_drops(spark):
    from parquet_python_spark.functions import text as T

    docs = spark.createDataFrame(
        [(i, "same line") for i in range(4)],
        "doc_id long, text string")
    assert T.strip_boilerplate(docs, min_docs=3).count() == 0


def test_corpus_rarity_counts(spark):
    from parquet_python_spark.functions import text as T

    docs = spark.createDataFrame(
        [(0, "the the cat"), (1, "the dog")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["tok_mass"], r["n_toks"])
           for r in T.corpus_rarity(docs).collect()}
    # corpus counts: the=3, cat=1, dog=1
    assert got[0] == (3 + 3 + 1, 3)
    assert got[1] == (3 + 1, 2)


# ------------------------------------------------- xxhash64 production twins

def test_minhash_xxhash_twin_matches_pair_set(spark, docs):
    """r3 VERDICT task 5: the xxhash64 production twin finds the same
    near-dup pair set as the md5 oracle twin on the fixture (both are
    uniform hash families; only per-pair estimates may vary by estimator
    variance)."""
    md5_pairs = dedup.minhash_lsh_pairs(docs, tau=0.5, docfreq_cap=None)
    xx_pairs = dedup.minhash_lsh_pairs(docs, tau=0.5, docfreq_cap=None,
                                       hash="xxhash64")
    m = {tuple(x) for x in md5_pairs.toPandas()[["a", "b"]].to_numpy()}
    x = {tuple(x) for x in xx_pairs.toPandas()[["a", "b"]].to_numpy()}
    assert (0, 1) in x
    assert m == x


def test_simhash_xxhash_twin_matches_pair_set(spark, docs):
    md5_pairs = dedup.simhash_near_pairs(docs, max_hamming=3)
    xx_pairs = dedup.simhash_near_pairs(docs, max_hamming=3, hash="xxhash64")
    m = {tuple(x) for x in md5_pairs.toPandas()[["a", "b"]].to_numpy()}
    x = {tuple(x) for x in xx_pairs.toPandas()[["a", "b"]].to_numpy()}
    assert m == x


def test_sample_stratified_xxhash_twin(spark, corpus):
    """Production twin keeps the configured rates (within binomial
    tolerance), is deterministic across re-runs, and never leaks strata
    with rate 0."""
    out1 = sampling.sample_stratified(corpus, {"en": 0.5, "fr": 0.1},
                                      "lang", "doc_id", hash="xxhash64")
    out2 = sampling.sample_stratified(corpus, {"en": 0.5, "fr": 0.1},
                                      "lang", "doc_id", hash="xxhash64")
    p1 = out1.toPandas().sort_values("doc_id")
    p2 = out2.toPandas().sort_values("doc_id")
    assert p1.doc_id.tolist() == p2.doc_id.tolist()
    by = p1.groupby("lang").size()
    assert "zh" not in by
    assert abs(by.get("en", 0) - 600) < 120   # 1200 en rows @ 0.5
    assert abs(by.get("fr", 0) - 40) < 40     # 400 fr rows @ 0.1


def test_para_dedup_hash_shuffle_ships_sha_not_text(spark):
    """r3 VERDICT task 6: the window over the paragraph hash must not
    carry the paragraph text — the exchange feeding it projects
    (id, pos, sha) only; the text crosses a single id-keyed exchange."""
    df = spark.createDataFrame(
        [(1, ["alpha beta", "gamma"]), (2, ["alpha beta", "delta"])],
        ["doc_id", "paras"])
    out = dedup.dedup_paragraphs(df)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the Window and its group-limit run AFTER the hash exchange; their
    # operator lines must reference only (doc_id, pos, h) — the text is
    # consumed map-side by the sha2 projection below the exchange
    for line in plan.splitlines():
        if "Window" in line:
            assert "para#" not in line, line
    win_project = next(line for line in plan.splitlines()
                       if "sha2(" in line and "Project" in line)
    assert "+- Project [doc_id#" in win_project
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["text_dedup"] == "alpha beta\n\ngamma"
    assert got[2]["n_kept"] == 1 and got[2]["text_dedup"] == "delta"
    assert got[2]["n_total"] == 2


def test_mix_corpus_xxhash_twin(spark, corpus):
    """mix_proportions production twin: same mixture targets honored
    (within binomial tolerance), deterministic across runs."""
    t = {"en": 0.6, "fr": 0.4}
    out1 = sampling.mix_proportions(corpus, t, "lang", "doc_id",
                                    hash="xxhash64").toPandas()
    out2 = sampling.mix_proportions(corpus, t, "lang", "doc_id",
                                    hash="xxhash64").toPandas()
    assert sorted(out1.doc_id) == sorted(out2.doc_id)
    by = out1.groupby("lang").size()
    assert "zh" not in by
    total = by.sum()
    assert abs(by["en"] / total - 0.6) < 0.08
