"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are built from ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen — no Python in the row path); the one genuinely
imperative op (winnowing fingerprints) is an Arrow-batched pandas UDF over
numpy.  Each op has an exact ANSI-SQL twin used as the DuckDB oracle (see
``__spark_entry__.oracle_sql``), so formulas deliberately stick to
integer-derived ratios rounded at the end.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

TOKEN_RE = r"\S+"
WORD_RE = "[a-z0-9]+"
# GPT-2-style pre-tokenizer shape WITHOUT lookahead (RE2-compatible, so
# the DuckDB oracle runs the identical pattern): optional leading space +
# letter run / digit run / punctuation run, else whitespace run
BPE_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
STOPWORDS = ("the", "a", "and", "of", "in", "to")


def token_counts(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting: whitespace tokens plus a BPE-ish pre-tokenization
    count (the statistic a training-data pipeline budgets by)."""
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(F.col(col), F.lit(TOKEN_RE), 0)).alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col(col), F.lit(BPE_RE), 0)).alias("n_bpe_tokens"),
        F.length(col).alias("n_chars_len"),
    )


def quality_scores(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic document quality: length / alpha ratio / stopword ratio.

    score = 0.4*min(words/100, 1) + 0.4*alpha_ratio + 0.2*stopword_hit
    — every term is a ratio of integers so Spark and the SQL oracle agree
    bit-for-bit before the final round(3)."""
    c = F.col(col)
    toks = F.regexp_extract_all(F.lower(c), F.lit(WORD_RE), 0)
    n_words = F.size(toks)
    n_alpha = F.length(F.regexp_replace(c, "[^A-Za-z]", ""))
    n_len = F.length(c)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    score = (
        0.4 * F.least(n_words / F.lit(100.0), F.lit(1.0))
        + 0.4 * (n_alpha / F.nullif(n_len, F.lit(0)))
        + 0.2 * (n_stop / F.nullif(n_words, F.lit(0)))
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(n_alpha / F.nullif(n_len, F.lit(0)), 3).alias("alpha_ratio"),
        F.round(n_stop / F.nullif(n_words, F.lit(0)), 3).alias("stopword_ratio"),
        F.round(score, 3).alias("quality"),
    )


# marker-word cascade; ordering matters and is mirrored in the SQL oracle
LANG_MARKERS = [
    ("c", "#include"),
    ("python", "import "),
    ("go", "func "),
    ("rust", "fn "),
    ("javascript", "const "),
]


def lang_id(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """n-gram/marker language-ID heuristic (deterministic CASE cascade)."""
    c = F.col(col)
    expr = F.lit("unknown")
    for lang, marker in reversed(LANG_MARKERS):
        expr = F.when(c.contains(marker), F.lit(lang)).otherwise(expr)
    return df.select(F.col(id_col), expr.alias("pred_lang"))


def fingerprints(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace-normalized md5 document fingerprint."""
    norm = F.lower(F.regexp_replace(F.col(col), r"\s+", " "))
    return df.select(F.col(id_col), F.md5(norm).alias("fingerprint"))


# ------------------------------------------------------- winnowing (UDF path)

def _rolling_hashes(toks: np.ndarray, k: int) -> np.ndarray:
    """k-gram hashes from per-token hashes via a vectorized window-combine."""
    if len(toks) < k:
        return np.zeros(0, dtype=np.uint64)
    # combine k consecutive token-hashes with distinct per-offset multipliers
    out = np.zeros(len(toks) - k + 1, dtype=np.uint64)
    for j in range(k):  # k iterations (k~5), each vectorized over all rows
        out ^= toks[j:len(toks) - k + 1 + j] * np.uint64(0x9E3779B97F4A7C15 + 2 * j + 1)
    return out


def winnow_fingerprints(df: DataFrame, col: str = "text", id_col: str = "doc_id",
                        k: int = 5, window: int = 4) -> DataFrame:
    """Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03) fingerprints: min
    hash per sliding window of k-gram hashes.  Arrow-batched ``mapInPandas``
    — per-batch numpy, no per-row Python."""
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType
    schema = StructType([
        StructField(id_col, LongType()),
        StructField("fingerprints", ArrayType(LongType())),
    ])

    def run(batches):
        for pdf in batches:
            texts = pdf[col].fillna("")
            split = texts.str.lower().str.findall(WORD_RE)
            lens = split.str.len().to_numpy()
            flat = pd.Series(np.concatenate(split.to_numpy()) if lens.sum() else [],
                             dtype=object)
            # deterministic vectorized 64-bit token hashes (fixed hash_key)
            th_all = pd.util.hash_pandas_object(flat, index=False).to_numpy()
            offsets = np.zeros(len(pdf) + 1, dtype=np.int64)
            np.cumsum(lens, out=offsets[1:])
            fps = []
            for i in range(len(pdf)):  # per-doc loop over numpy slices only
                th = th_all[offsets[i]:offsets[i + 1]]
                kg = _rolling_hashes(th, k)
                if len(kg) == 0:
                    sel = np.zeros(0, dtype=np.uint64)
                elif len(kg) <= window:
                    sel = np.array([kg.min()], dtype=np.uint64)
                else:
                    w = np.lib.stride_tricks.sliding_window_view(kg, window)
                    sel = np.unique(w.min(axis=1))
                fps.append(sel.astype(np.int64).tolist())
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "fingerprints": fps})

    from ._parallel import ensure_parallelism

    return ensure_parallelism(df.select(id_col, col)).mapInPandas(run, schema)
