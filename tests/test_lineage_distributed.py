"""Lineage commit is fully distributed (r3 VERDICT task 3).

The lineage table is a delta log: appends write O(batch) rollup rows,
``read_lineage`` applies the associative COMBINE on read, maintenance
commits swap a freshly-written directory — and at no point does a
per-part row land on the driver (the old ``toPandas()`` round-trip was
10^6–10^8 rows at 100 TB scale).  The reference's analogue is the
`_metadata` footer fastparquet rewrites per commit (writer.py:1464-1494);
a footer rewrite is O(row-groups) too, which is exactly what this design
avoids.
"""
import inspect

import pytest
from pyspark.sql import functions as F

from parquet_python_spark.operators import pipeline as pl

pytestmark = pytest.mark.spark


def _docs(spark, lo, hi):
    return (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .withColumn("repo", (F.col("doc_id") % 5).cast("string"))
            .withColumn("path", F.col("doc_id").cast("string"))
            .withColumn("commit", F.lit("0")))


COLS = ["doc_id", "text", "lang"]


def test_no_driver_materialization_in_commit_paths():
    """No toPandas / collect-of-parts in any lineage commit function."""
    for fn in (pl.write_blockstore, pl._commit_blocks_delta,
               pl._swap_lineage, pl.compact_store, pl.sort_store,
               pl.run_encode):
        src = inspect.getsource(fn)
        assert "toPandas" not in src, fn.__name__


def test_swap_write_plan_has_no_single_partition_exchange(spark, tmp_path):
    """The distributed lineage rewrite hash-partitions by part_key; a
    coalesce(1)/SinglePartition exchange would funnel 10^8 rollup rows
    through one task."""
    store = str(tmp_path / "s")
    pl.run_encode(_docs(spark, 0, 300), store, columns=COLS,
                  target_rows=100, resume=False)
    lin = pl.read_lineage(spark, store)
    plan = (lin.repartition(F.col("part_key"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "SinglePartition" not in plan
    assert "hashpartitioning(part_key" in plan


def test_append_is_delta_not_rewrite(spark, tmp_path):
    """A second append leaves the first commit's lineage files untouched
    on disk (O(batch) commit, never O(store))."""
    store = str(tmp_path / "s")
    pl.run_encode(_docs(spark, 0, 200), store, columns=COLS,
                  target_rows=100, resume=False)
    first_files = pl._list_part_files(f"{store}/lineage")
    assert first_files
    pl.run_encode(_docs(spark, 200, 500), store, columns=COLS,
                  target_rows=100, resume=False, generation=1)
    after = pl._list_part_files(f"{store}/lineage")
    assert first_files <= after and len(after) > len(first_files)
    # combined view stays one-row-per-part and truthful to decode
    lin = pl.read_lineage(spark, store)
    assert lin.groupBy("part_key").count().where("count > 1").count() == 0
    total = lin.agg(F.sum("n_rows")).collect()[0][0]
    assert total == pl.decode_blocks(pl.read_blocks(spark, store)).count()


def test_delta_log_folds_past_threshold(spark, tmp_path, monkeypatch):
    """Once the delta log fragments past LINEAGE_FOLD_FILES the commit
    folds it with a distributed rewrite + directory swap; totals are
    unchanged (the combine is associative)."""
    monkeypatch.setattr(pl, "LINEAGE_FOLD_FILES", 2)
    store = str(tmp_path / "s")
    for gen, (lo, hi) in enumerate([(0, 100), (100, 200), (200, 300),
                                    (300, 400)]):
        pl.run_encode(_docs(spark, lo, hi), store, columns=COLS,
                      target_rows=50, resume=False, generation=gen)
    assert len(pl._list_part_files(f"{store}/lineage")) <= 3
    summary = pl.store_summary(spark, store)
    assert summary["rows"] == 400
    dec = pl.decode_blocks(pl.read_blocks(spark, store))
    assert dec.count() == 400


def test_maintenance_commit_after_fold_roundtrips(spark, tmp_path):
    """compact_store over a delta-logged lineage: swap commit, combined
    reads, full fidelity."""
    store = str(tmp_path / "s")
    src = _docs(spark, 0, 400)
    pl.run_encode(src, store, columns=COLS, target_rows=100, resume=False)
    pl.run_encode(_docs(spark, 400, 500), store, columns=COLS,
                  target_rows=100, resume=False, generation=1)
    pl.compact_store(spark, store, max_pages_per_column=1)
    dec = pl.decode_blocks(pl.read_blocks(spark, store))
    full = src.select(*COLS).unionByName(_docs(spark, 400, 500)
                                         .select(*COLS))
    assert pl.verify_roundtrip(full, dec)["ok"]


def test_swap_crash_window_rolls_forward(spark, tmp_path):
    """A crash between the swap's two renames (old dir moved away, new
    dir not yet in place) must roll forward on the next read: the
    fully-written lineage.tmp (_SUCCESS present) IS the committed state."""
    import os
    import shutil

    store = str(tmp_path / "s")
    pl.run_encode(_docs(spark, 0, 300), store, columns=COLS,
                  target_rows=100, resume=False)
    before = pl.store_summary(spark, store)
    # simulate the crash state: lineage.tmp complete, lineage gone
    shutil.copytree(f"{store}/lineage", f"{store}/lineage.tmp")
    shutil.move(f"{store}/lineage", f"{store}/lineage.dead")
    assert not os.path.isdir(f"{store}/lineage")
    spark.catalog.refreshByPath(f"{store}/lineage")
    after = pl.store_summary(spark, store)
    assert after == before
    assert os.path.isdir(f"{store}/lineage")
    assert not os.path.isdir(f"{store}/lineage.dead")


def test_repair_lineage_recovers_lost_delta(spark, tmp_path):
    """Crash window: blocks committed, lineage delta lost.  Resume must
    not re-encode (completed_part_keys reads blocks), and repair_lineage
    must restore the rollups from the blocks table."""
    import os

    store = str(tmp_path / "s")
    pl.run_encode(_docs(spark, 0, 200), store, columns=COLS,
                  target_rows=100, resume=False)
    pl.run_encode(_docs(spark, 200, 500), store, columns=COLS,
                  target_rows=100, resume=False, generation=1)
    true_rows = pl.decode_blocks(pl.read_blocks(spark, store)).count()
    assert true_rows == 500
    # simulate the crash: drop the SECOND commit's lineage delta files
    files = sorted(pl._list_part_files(f"{store}/lineage"),
                   key=os.path.getmtime)
    for f in files[len(files) // 2:]:
        os.remove(f)
    spark.catalog.refreshByPath(f"{store}/lineage")
    assert pl.store_summary(spark, store)["rows"] < true_rows
    # resume with the same generation-1 input: nothing re-encodes
    # (blocks are the completion ground truth; the append may add an
    # EMPTY part file, so assert on rows, not file sets)
    pl.run_encode(_docs(spark, 200, 500), store, columns=COLS,
                  target_rows=100, resume=True, generation=1)
    assert pl.decode_blocks(pl.read_blocks(spark, store)).count() == 500
    fixed = pl.repair_lineage(spark, store)
    assert fixed["rows"] == true_rows
    lin = pl.read_lineage(spark, store)
    assert lin.groupBy("part_key").count().where("count > 1").count() == 0
