"""Skew-aware partition planning: repo-hash partitioning with salted splits.

Re-creates the reference's row-group chunking (``iter_dataframe``,
fastparquet/writer.py:1097-1131 — fixed ROW_GROUP_SIZE slices of a local
DataFrame) as a *distributed, skew-aware* plan per the north rule:

* the unit of encode work (our "row group") is a **(repo, split_id)** pair;
* small repos get one split; a mega-repo bigger than ``target_rows`` is
  salted into ``ceil(rows / target_rows)`` splits so no single Spark task
  inherits the whole head of the zipf distribution;
* ``split_id = pmod(xxhash64(path, commit), n_splits)`` is a pure function
  of row identity — NOT of partitioning — so re-running at any cluster
  size or resuming after failure re-creates the identical assignment
  (resume-stable lineage, north_rule).

The plan itself is one tiny aggregate over the ``repo`` column (Catalyst
prunes the scan to that column); it is broadcast to the assignment join.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_TARGET_ROWS = 250_000


def plan_splits(df: DataFrame, target_rows: int = DEFAULT_TARGET_ROWS) -> DataFrame:
    """Per-repo split counts: ``(repo, n_splits)``.

    One narrow agg; at 100 TB this is a column-pruned scan of `repo` only.
    """
    return (
        df.groupBy("repo")
        .agg(F.count(F.lit(1)).alias("_rows"))
        .select(
            "repo",
            F.greatest(
                F.lit(1), F.ceil(F.col("_rows") / F.lit(target_rows))
            ).cast("int").alias("n_splits"),
        )
    )


def assign_part_keys(df: DataFrame, plan: DataFrame) -> DataFrame:
    """Add ``split_id`` and ``part_key`` columns.

    ``part_key`` identifies one encode unit (repo × salt split). The join
    against the per-repo plan is broadcast (the plan has one row per repo —
    tiny next to the fact table).
    """
    out = df.join(F.broadcast(plan), "repo", "left").withColumn(
        "n_splits", F.coalesce(F.col("n_splits"), F.lit(1))
    )
    out = out.withColumn(
        "split_id",
        F.pmod(F.xxhash64(F.col("path"), F.col("commit")), F.col("n_splits")).cast("int"),
    )
    return out.withColumn(
        "part_key", F.xxhash64(F.col("repo"), F.col("split_id"))
    ).drop("n_splits")


def with_partition_plan(df: DataFrame, target_rows: int = DEFAULT_TARGET_ROWS,
                        plan: DataFrame | None = None) -> DataFrame:
    """Convenience: plan + assign in one call."""
    if plan is None:
        plan = plan_splits(df, target_rows)
    return assign_part_keys(df, plan)
