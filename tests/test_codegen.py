"""Synthetic source-code table generator: determinism, skew, schema."""
import numpy as np
import pandas as pd
import pytest

from parquet_python_spark.sources import codegen as cg


def test_schema_and_types():
    df = cg.generate_batch(0, 100)
    assert list(df.columns) == ["repo", "path", "commit", "lang", "content"]
    assert df.notna().all().all()
    assert df["commit"].str.len().eq(40).all()
    assert df["commit"].str.fullmatch(r"[0-9a-f]{40}").all()
    assert df["path"].str.startswith("src/").all()
    assert set(df["lang"]).issubset(set(cg.LANGS))


def test_partition_independence():
    """Rows depend only on global index, not on batch boundaries."""
    whole = cg.generate_batch(0, 300)
    a = cg.generate_batch(0, 120)
    b = cg.generate_batch(120, 180)
    recon = pd.concat([a, b], ignore_index=True)
    assert recon.equals(whole)


def test_non_contiguous_ids():
    ids = np.array([5, 6, 7, 100, 101, 4000])
    df = cg.generate_batch_for_ids(ids)
    whole = cg.generate_batch(0, 4001)
    assert df.reset_index(drop=True).equals(
        whole.iloc[ids].reset_index(drop=True))


def test_skewed_repo_distribution():
    df = cg.generate_batch(0, 20000)
    vc = df["repo"].value_counts(normalize=True)
    assert vc.iloc[0] > 0.2, "mega-repo head missing"
    assert vc.iloc[1] > 0.07
    assert df["repo"].nunique() > 100, "tail missing"


def test_seed_changes_output():
    a = cg.generate_batch(0, 50, seed=1)
    b = cg.generate_batch(0, 50, seed=2)
    assert not a["content"].equals(b["content"])


def test_content_is_code_like():
    df = cg.generate_batch(0, 2000)
    py = df[df.lang == "python"]["content"]
    assert py.str.contains("def |import ", regex=True).mean() > 0.9
    lens = df["content"].str.len()
    assert lens.min() > 0 and lens.mean() > 200


@pytest.mark.spark
def test_spark_code_table_matches_local(spark):
    sdf = cg.code_table(spark, 500, partitions=4)
    got = sdf.toPandas().sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    want = cg.generate_batch(0, 500).sort_values(
        ["repo", "path", "commit"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
