"""Driver-harness simulation: every queries() entry with an oracle_sql()
twin must produce identical (row count, column names, sorted values) to
DuckDB on the same parquet tables — this mirrors CORRECTNESS_r{N}.json."""
import math

import numpy as np

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

pytestmark = pytest.mark.spark

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            if len(df) and isinstance(df[c].iloc[0], (list, tuple)) or \
                    len(df) and hasattr(df[c].iloc[0], "__len__") and \
                    not isinstance(df[c].iloc[0], str):
                df[c] = df[c].map(lambda v: tuple(np.asarray(v).tolist()))
                continue
            try:
                df[c] = df[c].astype(float)
            except (ValueError, TypeError):
                pass
    df = df.sort_values(list(df.columns), ignore_index=True)
    return df


def _compare(name, spark_df, oracle_df):
    a, b = _normalize(spark_df), _normalize(oracle_df)
    assert list(a.columns) == list(b.columns), \
        f"{name}: columns {list(a.columns)} != {list(b.columns)}"
    assert len(a) == len(b), f"{name}: rows {len(a)} != {len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            ok = ((av.isna() & bv.isna())
                  | (av.astype(float) == bv.astype(float))).all()
        else:
            ok = av.astype(str).equals(bv.astype(str))
        assert ok, f"{name}.{c}: value mismatch\n{a[~ (av.astype(str) == bv.astype(str))].head()}\nvs\n{b[~ (av.astype(str) == bv.astype(str))].head()}"


ORACLE_QUERIES = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    spark_pdf = q(spark, SF_DIR).toPandas()
    oracle_pdf = ddb.sql(entry_mod.oracle_sql()[name]).df()
    _compare(name, spark_pdf, oracle_pdf)


def test_all_oracles_have_queries():
    qs = entry_mod.queries()
    for name in entry_mod.oracle_sql():
        assert name in qs


def test_rows_only_queries_run(spark):
    qs = entry_mod.queries()
    for name in set(qs) - set(entry_mod.oracle_sql()):
        df = qs[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    pdf = df.toPandas()
    assert len(pdf) == 500
    assert set(pdf.columns) == {"doc_id", "sha"}
