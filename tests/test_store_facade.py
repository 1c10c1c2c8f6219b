"""BlockStore facade: the ParquetFile-shaped API surface (fastparquet
api.py:106-1327) over the blockstore — a reference user maps one-to-one."""
import pytest
from pyspark.sql import functions as F

from parquet_python_spark import BlockStore
from parquet_python_spark.sources import codegen as cg

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("facade") / "bs")
    df = cg.code_table(spark, 1000, partitions=3)
    bs = BlockStore.write(df, path, target_rows=300)
    return bs, df


def test_count_columns_dtypes(store):
    bs, df = store
    assert bs.count() == 1000
    assert set(bs.columns) == {"repo", "path", "commit", "lang", "content"}
    assert bs.dtypes["content"] == "string"


def test_to_pandas_projection_and_filter(store):
    bs, df = store
    pdf = bs.to_pandas(columns=["repo", "lang"],
                       filters=[("lang", "==", "python")])
    want = df.where(F.col("lang") == "python").count()
    assert len(pdf) == want
    assert list(pdf.columns) == ["repo", "lang"]


def test_sql_over_decoded_view(store):
    bs, df = store
    got = bs.sql("SELECT lang, count(*) AS n FROM store GROUP BY lang "
                 "ORDER BY lang").collect()
    want = (df.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
            .orderBy("lang").collect())
    assert [(r["lang"], r["n"]) for r in got] == \
        [(r["lang"], r["n"]) for r in want]


def test_profile_over_store(store):
    bs, df = store
    prof = {r["column"]: r for r in bs.profile(["lang", "repo"]).collect()}
    assert prof["lang"]["n_rows"] == df.count()
    assert prof["lang"]["n_distinct"] == df.select("lang").distinct().count()
    assert prof["repo"]["n_null"] == 0


def test_head_and_iter(store):
    bs, _ = store
    assert bs.head(7).count() == 7
    first = next(bs.iter_row_groups(columns=["lang"]))
    assert list(first.columns) == ["lang"] and len(first) > 0


def test_statistics_and_metadata(store):
    bs, _ = store
    stats = bs.statistics().toPandas()
    assert {"column", "min_num", "max_num"} <= set(stats.columns)
    bs.update_metadata({"owner": "tests"})
    assert bs.key_value_metadata["owner"] == "tests"


def test_append_and_verify(spark, tmp_path):
    df = cg.code_table(spark, 600, partitions=2)
    path = str(tmp_path / "bs2")
    bs = BlockStore.write(df.limit(400), path, target_rows=200)
    bs.append(df.subtract(df.limit(400)), generation=1)
    assert bs.count() == 600
    assert bs.verify(df)["ok"]
