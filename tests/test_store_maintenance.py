"""Store maintenance: merge_stores / remove_parts / remove_repos — parity
with the reference's merge (fastparquet writer.py:1464-1494) and
ParquetFile.remove_row_groups (api.py:415-574) on the blockstore."""
import pytest
from pyspark.sql import functions as F

from parquet_python_spark.operators import pipeline as pl
from parquet_python_spark.sources import codegen as cg

pytestmark = pytest.mark.spark


def _docs(spark, lo, hi, repo_mod=5):
    return (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .withColumn("repo", (F.col("doc_id") % repo_mod).cast("string"))
            .withColumn("path", F.col("doc_id").cast("string"))
            .withColumn("commit", F.lit("0")))


COLS = ["doc_id", "text", "lang"]


def test_merge_disjoint_stores(spark, tmp_path):
    """Two stores of different repos merge without decoding anything."""
    a, b, out = (str(tmp_path / x) for x in ("a", "b", "out"))
    da = _docs(spark, 0, 200).withColumn("repo", F.lit("ra"))
    db = _docs(spark, 200, 500).withColumn("repo", F.lit("rb"))
    pl.run_encode(da, a, columns=COLS, target_rows=100, resume=False)
    pl.run_encode(db, b, columns=COLS, target_rows=100, resume=False)
    res = pl.merge_stores(spark, [a, b], out)
    assert res["rows"] == 500
    dec = pl.decode_blocks(pl.read_blocks(spark, out))
    src = da.select(*COLS).unionByName(db.select(*COLS))
    assert pl.verify_roundtrip(src, dec)["ok"]


def test_merge_colliding_parts(spark, tmp_path):
    """Same repos in both stores -> identical part_keys collide; rows must
    be unioned per part, never block-concatenated (overlapping page ids)."""
    a, b, out = (str(tmp_path / x) for x in ("a", "b", "out"))
    da = _docs(spark, 0, 300)
    db = _docs(spark, 300, 500)
    pl.run_encode(da, a, columns=COLS, target_rows=100, resume=False)
    pl.run_encode(db, b, columns=COLS, target_rows=100, resume=False)
    res = pl.merge_stores(spark, [a, b], out)
    assert res["rows"] == 500
    dec = pl.decode_blocks(pl.read_blocks(spark, out))
    src = da.select(*COLS).unionByName(db.select(*COLS))
    assert pl.verify_roundtrip(src, dec)["ok"]
    # lineage part_keys unique after merge
    lin = pl.read_lineage(spark, out)
    assert lin.groupBy("part_key").count().where(F.col("count") > 1).count() == 0


def test_remove_parts(spark, tmp_path):
    store = str(tmp_path / "rp")
    df = cg.code_table(spark, 600, partitions=2)
    pl.run_encode(df, store, target_rows=200, resume=False)
    lin = pl.read_lineage(spark, store).orderBy("part_key").collect()
    drop = lin[0]
    res = pl.remove_parts(spark, store, [drop["part_key"]])
    assert res["rows"] == 600 - drop["n_rows"]
    left = pl.read_lineage(spark, store).select("part_key").collect()
    assert drop["part_key"] not in {r["part_key"] for r in left}


def test_remove_repos_shared_bucket(spark, tmp_path):
    """Removing a repo that shares a packed bucket decodes + re-encodes
    only that bucket; other repos' rows survive byte-identically."""
    store = str(tmp_path / "rr")
    df = _docs(spark, 0, 500)  # repos '0'..'4' bin-packed together
    cols = ["repo"] + COLS  # repo encoded so shared buckets are filterable
    pl.run_encode(df, store, columns=cols, target_rows=200, resume=False)
    res = pl.remove_repos(spark, store, ["2"])
    want = df.where(F.col("repo") != "2")
    assert res["rows"] == want.count()
    dec = pl.decode_blocks(pl.read_blocks(spark, store))
    assert pl.verify_roundtrip(want.select(*cols), dec)["ok"]
    assert dec.where(F.col("repo") == "2").count() == 0


def test_compact_restores_whole_part_ratio(spark, tmp_path):
    """local-strategy ingest fragments parts into per-source-partition
    sub-blocks (fast, no raw shuffle); compact_store re-encodes them whole
    and must shrink the store while preserving every row."""
    store = str(tmp_path / "compact")
    df = cg.code_table(spark, 3000, partitions=8).cache()
    pl.run_encode(df, store, target_rows=1500, resume=False,
                  strategy="local")
    blocks = pl.read_blocks(spark, store)
    frag_pages = (blocks.groupBy("part_key", "column")
                  .agg(F.countDistinct("page_id").alias("np"))
                  .agg(F.max("np")).collect()[0][0])
    assert frag_pages > 4, "local strategy should fragment pages"
    res = pl.compact_store(spark, store, max_pages_per_column=4)
    assert res["parts_compacted"] > 0
    assert res["enc_bytes_after"] < res["enc_bytes_before"]
    dec = pl.decode_blocks(pl.read_blocks(spark, store))
    assert pl.verify_roundtrip(df, dec)["ok"]
    df.unpersist()


def test_remove_repos_local_strategy_preserves_other_repos(spark, tmp_path):
    """r2 review finding: with strategy='local', a shared bucket holds
    per-source-partition repo-LABELED sub-blocks; removal must not drop
    other repos' sub-blocks just because one block carries the removed
    label."""
    store = str(tmp_path / "rrlocal")
    df = _docs(spark, 0, 500).repartition("repo")  # repo-pure partitions
    cols = ["repo"] + COLS
    pl.run_encode(df, store, columns=cols, target_rows=200, resume=False,
                  strategy="local")
    res = pl.remove_repos(spark, store, ["2"])
    want = df.where(F.col("repo") != "2")
    assert res["rows"] == want.count()
    dec = pl.decode_blocks(pl.read_blocks(spark, store))
    assert pl.verify_roundtrip(want.select(*cols), dec)["ok"]
    assert dec.where(F.col("repo") == "2").count() == 0


def test_encode_local_tolerates_empty_partitions(spark):
    """r2 review finding: mapInArrow invokes the UDF with an empty batch
    iterator for empty partitions; the local strategy must no-op there."""
    df = cg.code_table(spark, 50, partitions=2).repartition(16)
    from parquet_python_spark.plans import partitioning as part

    assigned = part.with_partition_plan(df, 100)
    blocks = pl.encode_table_local(assigned)
    dec = pl.decode_blocks(blocks)
    assert pl.verify_roundtrip(df, dec)["ok"]


def test_double_append_lineage_combines_and_decode_refuses(spark, tmp_path):
    """r2 review finding: appending the same part_key twice COMBINES the
    lineage rollups (counts stay truthful to the stored blocks), and
    decode refuses the ambiguous duplicate pages loudly instead of
    risking silent cross-column row misalignment."""
    store = str(tmp_path / "dappend")
    df = _docs(spark, 0, 200)
    pl.run_encode(df, store, columns=COLS, target_rows=500, resume=False)
    pl.run_encode(df, store, columns=COLS, target_rows=500, resume=False)
    lin_rows = pl.read_lineage(spark, store).agg(
        F.sum("n_rows")).collect()[0][0]
    assert lin_rows == 400  # combined, not replaced
    with pytest.raises(Exception, match="appended twice"):
        pl.decode_blocks(pl.read_blocks(spark, store)).count()


def _file_snap(store):
    import glob
    import hashlib
    import os

    return {p: (os.path.getsize(p),
                hashlib.md5(open(p, "rb").read()).hexdigest())
            for p in glob.glob(f"{store}/blocks/part-*")}


def test_remove_parts_leaves_untouched_files_intact(spark, tmp_path):
    """r2 review finding: maintenance commits must be O(affected), not
    O(store) — parquet part-files that hold no removed part stay on disk
    byte-identical (same name, same bytes), mirroring the reference's
    remove_row_groups touching only _metadata (api.py:415-574)."""
    store = str(tmp_path / "fgr")
    df = cg.code_table(spark, 600, partitions=4)
    # AQE would coalesce this tiny encode into ONE output file, which
    # defeats a file-granularity assertion; production stores are
    # many-file by nature
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        # shuffle strategy: each output file holds whole parts, so there
        # IS a part whose files are a strict subset — the property under
        # test (O(affected) commits) is layout-independent, but asserting
        # byte-identity of untouched files needs the part→file layout
        pl.run_encode(df, store, target_rows=150, resume=False,
                      strategy="shuffle")
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
                       "true")
    before = _file_snap(store)
    assert len(before) > 1, "need a multi-file store for this test"
    fmap = (pl.read_blocks(spark, store)
            .withColumn("f", F.input_file_name())
            .select("part_key", "f").distinct().collect())
    by_key: dict = {}
    for r in fmap:
        by_key.setdefault(r["part_key"], set()).add(
            pl._uri_to_local(r["f"]))
    all_files = set().union(*by_key.values())
    drop = next(k for k, v in by_key.items() if v != all_files)
    touched = by_key[drop]
    n_before = pl.read_lineage(spark, store).agg(
        F.sum("n_rows")).collect()[0][0]
    drop_rows = [r["n_rows"] for r in pl.read_lineage(spark, store).collect()
                 if r["part_key"] == drop][0]
    res = pl.remove_parts(spark, store, [drop])
    after = _file_snap(store)
    for p, sig in before.items():
        if p in touched:
            assert p not in after, "dead file must be unlinked"
        else:
            assert after[p] == sig, "untouched file must stay byte-identical"
    assert res["rows"] == n_before - drop_rows
    dec = pl.decode_blocks(pl.read_blocks(spark, store))
    assert dec.count() == res["rows"]


def test_compact_leaves_unfragmented_files_intact(spark, tmp_path):
    """Compaction rewrites only files holding fragmented parts; a prior
    whole-part generation's files survive byte-identically."""
    store = str(tmp_path / "fgc")
    df1 = cg.code_table(spark, 500, partitions=2)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        pl.run_encode(df1, store, target_rows=250, resume=False)
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled",
                       "true")
    gen1 = _file_snap(store)
    df2 = cg.code_table(spark, 3000, partitions=8)
    pl.run_encode(df2, store, target_rows=1500, resume=False,
                  strategy="local", generation=1)
    res = pl.compact_store(spark, store, max_pages_per_column=4)
    assert res["parts_compacted"] > 0
    after = _file_snap(store)
    for p, sig in gen1.items():
        assert after.get(p) == sig, \
            "whole-part generation files must stay byte-identical"
    dec = pl.decode_blocks(pl.read_blocks(spark, store))
    assert dec.count() == 3500


def test_concurrent_commit_fence_aborts_and_cleans(spark, tmp_path, monkeypatch):
    """Single-writer fence: if the lineage pointer epoch moves while a
    manifest is being written (another committer landed first), the commit
    must abort LOUDLY and delete its own manifest — a blind pointer PUT
    would silently drop the other committer's fold."""
    import glob
    import json
    import os

    store = str(tmp_path / "s")
    pl.run_encode(_docs(spark, 0, 200), store, columns=COLS,
                  target_rows=100, resume=False)
    # establish a pointer (epoch 1)
    pl.repair_lineage(spark, store)
    ptr_path = os.path.join(store, pl._LINEAGE_PTR)
    with open(ptr_path) as f:
        base_ptr = json.load(f)
    assert base_ptr["epoch"] == 1

    real_read = pl._read_lineage_ptr
    calls = {"n": 0}

    def racing_read(path):
        ptr = real_read(path)
        calls["n"] += 1
        if calls["n"] == 2 and ptr is not None:
            # simulate a committer that landed between our two reads
            return {**ptr, "epoch": ptr["epoch"] + 1}
        return ptr

    monkeypatch.setattr(pl, "_read_lineage_ptr", racing_read)
    lin = pl.read_lineage(spark, store)
    with pytest.raises(RuntimeError, match="concurrent lineage commit"):
        pl._commit_manifest(spark, store, lin)
    monkeypatch.setattr(pl, "_read_lineage_ptr", real_read)
    # the loser's manifest was GC'd; the winner's state is untouched
    manifests = glob.glob(os.path.join(store, "manifests", "manifest-*"))
    assert len(manifests) == 1
    assert os.path.basename(manifests[0]) == base_ptr["manifest"]
    with open(ptr_path) as f:
        assert json.load(f) == base_ptr
    assert pl.store_summary(spark, store)["rows"] == 200
