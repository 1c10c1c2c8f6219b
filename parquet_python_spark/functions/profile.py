"""Column profiling — the ANALYZE-style statistics pass a table owner runs
before trusting a new 100-TB drop: per column, row/null/distinct counts and
lexicographic min/max (everything profiled through a string cast so one
uniform output schema covers heterogeneous columns).

Plan shape (``.explain``-verified): the union-of-selects compiles to one
column-pruned scan PER COLUMN — total bytes read = the table once, each
column touched exactly once — feeding a single groupBy on the column name.
(An Expand-based unpivot would read the same bytes but replicate every row
n× into the aggregation; the per-column scans don't.)  ``count(distinct)``
is exact here because the oracle must reproduce it; at real scale flip
``exact=False`` for ``approx_count_distinct`` (HyperLogLog++, one pass,
mergeable) and accept the ±2% the SQL twin can't mirror.
"""
from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def profile(df: DataFrame, columns: list[str] | None = None,
            exact: bool = True) -> DataFrame:
    """Per-column stats: (column, n_rows, n_null, n_distinct, min_str,
    max_str).  NULLs are excluded from distinct/min/max in every engine's
    aggregate semantics, so the numbers are portable."""
    cols = columns or df.columns
    parts = [df.select(F.lit(c).alias("column"),
                       F.col(c).cast("string").alias("v")) for c in cols]
    u = reduce(DataFrame.unionByName, parts)
    ndv = (F.countDistinct("v") if exact
           else F.approx_count_distinct("v")).alias("n_distinct")
    return (u.groupBy("column")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.isnull("v").cast("long")).alias("n_null"),
                 ndv,
                 F.min("v").alias("min_str"),
                 F.max("v").alias("max_str")))


def profile_sql(table: str, columns: list[str]) -> str:
    """ANSI-SQL twin of :func:`profile` (oracle generator)."""
    selects = " UNION ALL ".join(
        f"SELECT '{c}' AS \"column\", {c}::VARCHAR AS v FROM {table}"
        for c in columns)
    return f"""
        WITH u AS ({selects})
        SELECT "column",
               count(*)::BIGINT AS n_rows,
               sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
               count(DISTINCT v)::BIGINT AS n_distinct,
               min(v) AS min_str,
               max(v) AS max_str
        FROM u GROUP BY "column" """
