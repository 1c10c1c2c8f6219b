"""Text-analysis operators for large-scale training-data pipelines.

Every op — including winnowing, as of r3 — is built purely from
``pyspark.sql.functions`` (JVM-side, whole-stage codegen: no Python
anywhere in the row path).  Each op has an exact ANSI-SQL twin used as the
DuckDB oracle (see ``__spark_entry__.oracle_sql``), so formulas
deliberately stick to integer-derived ratios rounded at the end.
"""
from __future__ import annotations

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


def corpus_rarity(df: DataFrame, col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Corpus-frequency rarity signal per document (the integer core of a
    CCNet-style unigram-LM quality score): every token joins its corpus
    count, and each doc reports (tok_mass = sum of its tokens' corpus
    counts, n_toks).  Low mass/n_toks = rare vocabulary (exotic or noisy
    text); high = boilerplate.  Kept in BIGINTs end-to-end so the DuckDB
    oracle matches bit-for-bit (a log-based LM score differs in the last
    ulp between libm implementations).

    100-TB shape: one map-side-combined groupBy(token) for the vocab and
    one shuffle join on token — both scale with the token stream; no
    driver-side state, no Python in the row path."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.regexp_extract_all(F.lower(F.col(col)),
                                       F.lit(WORD_RE), 0)).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    return (toks.join(vocab, "tok")
            .groupBy(id_col)
            .agg(F.sum("cnt").alias("tok_mass"),
                 F.count(F.lit(1)).alias("n_toks")))


def repetition_stats(df: DataFrame, col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-document repetition signals (the Gopher/MassiveText quality
    rules: duplicate-line fraction, duplicate-token fraction, longest
    line): emitted as raw BIGINT counts so filters derive any ratio and
    the cross-engine oracle is exact.  Pure per-row JVM expressions —
    whole-stage codegen, zero shuffles, zero Python."""
    lines = F.split(F.col(col), "\n")
    toks = F.regexp_extract_all(F.lower(F.col(col)), F.lit(WORD_RE), 0)
    return df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(F.array_distinct(lines)).cast("long")
         .alias("n_distinct_lines"),
        F.size(toks).cast("long").alias("n_toks"),
        F.size(F.array_distinct(toks)).cast("long")
         .alias("n_distinct_toks"),
        F.coalesce(F.array_max(F.transform(lines, F.length)),
                   F.lit(0)).cast("long").alias("max_line_len"))


def strip_boilerplate(df: DataFrame, col: str = "text",
                      id_col: str = "doc_id",
                      min_docs: int = 3) -> DataFrame:
    """Line-level boilerplate removal (the CCNet/C4 paragraph-dedup move):
    a line appearing in >= ``min_docs`` DISTINCT documents is boilerplate
    (license headers, nav chrome, repeated disclaimers) and is stripped
    from every document; docs whose every line is boilerplate drop out.

    Returns (id, clean_text, n_kept).  100-TB shape: one
    map-side-combined distinct-count per line, one anti-join on the line
    key, and per-doc reconstruction via collect_list + array_sort — the
    only shuffles are the two the semantics require, zero Python in the
    row path."""
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(col), "\n")).alias("pos", "line"))
    hot = (lines.groupBy("line")
           .agg(F.countDistinct(id_col).alias("docfreq"))
           .where(F.col("docfreq") >= min_docs).select("line"))
    kept = lines.join(hot, "line", "left_anti")
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "line"))),
        lambda x: x["line"])
    return (kept.groupBy(id_col)
            .agg(F.array_join(ordered, "\n").alias("clean_text"),
                 F.count(F.lit(1)).alias("n_kept")))


# ---------------------------------------------------------------- winnowing

def winnow_fingerprints(df: DataFrame, col: str = "text", id_col: str = "doc_id",
                        k: int = 5, window: int = 4) -> DataFrame:
    """Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03) fingerprints: the
    minimum hash of each sliding window of ``window`` consecutive k-gram
    hashes, deduplicated per document.

    Pure JVM expression tree (whole-stage codegen, zero Python in the row
    path, zero shuffles — r2 hashed each k-gram with a per-item
    ``hashlib.md5`` loop inside a pandas UDF, the one remaining hot-path
    Python loop): tokens and k-grams stay an ARRAY within their row
    (``transform`` over a ``sequence`` of window starts, no posexplode),
    each k-gram hashes via ``F.md5`` on the space-joined tokens
    (engine-portable — the DuckDB oracle reproduces fingerprints exactly),
    the sliding minimum is ``array_min`` over ``slice`` windows, and only
    the final distinct fingerprints explode into (doc, fp) rows."""
    # each non-cheap array lives in its own projection so every lambda
    # below slices a materialized ATTRIBUTE, never an inline expression:
    # an expression referenced inside a higher-order-function lambda is
    # re-evaluated PER ELEMENT (no CSE across lambda bodies) — inline,
    # the tokenizer would re-run per k-gram and the md5 transform per
    # window position, O(m^2) overall (measured 251 s vs 4 s at sf0.1).
    # CollapseProject keeps the aliases: a non-cheap expression referenced
    # more than once is not inlined.
    toks = F.regexp_extract_all(F.lower(F.col(col)), F.lit(WORD_RE), 0)
    tok_df = df.select(F.col(id_col), toks.alias("_toks"))
    m = F.size("_toks") - F.lit(k - 1)  # number of k-grams
    kg_h = F.transform(
        F.sequence(F.lit(1), m),
        lambda i: F.md5(F.concat_ws(" ", F.slice("_toks", i, k))))
    hashed = tok_df.select(F.col(id_col), m.alias("_m"), kg_h.alias("_kg"))
    mm = F.col("_m")
    sel = (
        F.when(mm <= 0, F.lit(None))  # no k-grams -> no rows after explode
        .when(mm <= window, F.array(F.array_min("_kg")))
        .otherwise(F.array_distinct(F.transform(
            F.sequence(F.lit(1), mm - F.lit(window - 1)),
            lambda j: F.array_min(F.slice("_kg", j, window)))))
    )
    return hashed.select(F.col(id_col), F.explode(sel).alias("fp"))
