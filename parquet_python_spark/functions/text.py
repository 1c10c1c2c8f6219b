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


# RE2-safe (no lookarounds) so the DuckDB oracle runs identical patterns;
# applied in ORDER (urls swallow embedded emails/digits first)
REDACT_RULES = [
    (r"https?://[^\s]+", "<URL>"),
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "<EMAIL>"),
    (r"[0-9]{7,}", "<NUM>"),
]


def redact(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII-style scrubbing for training corpora: URLs, emails, and long
    digit runs replaced with typed placeholders — pure JVM regexp_replace
    chain (whole-stage codegen), rule order fixed and oracle-mirrored."""
    out = F.col(col)
    for pat, repl in REDACT_RULES:
        out = F.regexp_replace(out, pat, repl)
    return df.select(F.col(id_col), out.alias("redacted"),
                     (out != F.col(col)).alias("changed"))


# ------------------------------------------------------- winnowing (UDF path)

def winnow_fingerprints(df: DataFrame, col: str = "text", id_col: str = "doc_id",
                        k: int = 5, window: int = 4) -> DataFrame:
    """Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03) fingerprints: the
    minimum hash of each sliding window of ``window`` consecutive k-gram
    hashes, deduplicated per document.

    k-gram hash = md5 of the space-joined k tokens — engine-portable, so
    a DuckDB oracle reproduces the fingerprints exactly (r1 used pandas'
    hash_pandas_object: unverifiable and pandas-version-tied).  The
    sliding-window minimum runs as vectorized np.minimum folds over the
    per-batch hash array; the only per-item Python is the md5 call
    itself.  Output: one (doc, fp) row per distinct selected hash."""
    import hashlib

    from pyspark.sql.types import StringType, StructField, StructType
    schema = StructType([
        StructField(id_col, df.schema[id_col].dataType),
        StructField("fp", StringType()),
    ])

    from ._ngrams import flat_ngrams

    def run(batches):
        for pdf in batches:
            got = flat_ngrams(pdf, col, k, WORD_RE)
            if got is None:
                continue
            kdoc, kg, valid = got
            ids = pdf[id_col].to_numpy()
            h = np.array([hashlib.md5(s.encode()).hexdigest()
                          for s in kg], dtype=object)
            out_ids, out_fps = [], []
            # kdoc is sorted (np.repeat of arange): searchsorted slices
            # each doc in O(log n) instead of a full boolean mask per doc
            starts = np.searchsorted(kdoc, np.arange(len(pdf)))
            ends = np.searchsorted(kdoc, np.arange(len(pdf)), side="right")
            for i in range(len(pdf)):  # numpy slices per doc
                hs = h[starts[i]:ends[i]][valid[starts[i]:ends[i]]]
                mc = len(hs)
                if mc == 0:
                    continue
                if mc <= window:
                    sel = np.array([hs.min()], dtype=object)
                else:
                    win = hs[:mc - window + 1]
                    for j in range(1, window):  # vectorized min folds
                        win = np.minimum(win, hs[j:mc - window + 1 + j])
                    sel = np.unique(win)
                out_ids.extend([ids[i]] * len(sel))
                out_fps.extend(sel.tolist())
            yield pd.DataFrame({id_col: out_ids, "fp": out_fps})

    from ._parallel import ensure_parallelism

    return ensure_parallelism(df.select(id_col, col)).mapInPandas(run, schema)
