"""Deterministic sampling / data-mixing operators for training-data curation.

A 100-TB pipeline can't use ``df.sample`` for corpus mixing: it is
nondeterministic across retries (a recomputed task resamples), which breaks
exactly-once semantics on speculative execution and makes runs
irreproducible.  These operators instead derive the keep/drop decision from
a content-stable hash of the row's id — the same row is kept or dropped on
every retry, every run, every engine:

    keep(row)  iff  uint32(md5(id)[:8 hex]) < floor(rate * 2^32)

which is map-only (zero shuffle), embarrassingly parallel, and exactly
reproducible in ANSI SQL (the DuckDB oracle evaluates the identical
predicate).  Per-stratum rates ride in on a broadcast join — a handful of
rows against the fact table, never a shuffle of the corpus.

``mix_proportions`` is the corpus-mixing form: given target fractions per
stratum (e.g. ``{"en": 0.5, "code": 0.3, "rest": 0.2}``), it computes the
largest achievable total consistent with the targets and the available
per-stratum counts (one map-side-combined count agg — the only job that
touches every row), converts them to per-stratum keep rates, and hash-samples.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

HASH_SPACE = 1 << 32  # first 8 md5 hex chars, uniform on [0, 2^32)


def _hash_u32(id_col: str, hash: str = "md5"):
    """uint32 from the id, uniform on [0, 2^32).

    ``md5`` (oracle twin) is portable to any SQL engine as
    ``('0x' || substring(md5(id), 1, 8))::BIGINT``; ``xxhash64``
    (production twin) takes the top 32 bits of Spark's native hash —
    no digest/hex materialization per row."""
    if hash == "xxhash64":
        return F.shiftrightunsigned(
            F.xxhash64(F.col(id_col).cast("string")), 32)
    if hash == "md5":
        return F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                      16, 10).cast("long")
    raise ValueError(f"unknown hash {hash!r} (md5 | xxhash64)")


def sample_stratified(df: DataFrame, rates: dict[str, float],
                      strata_col: str = "lang", id_col: str = "doc_id",
                      default_rate: float = 0.0,
                      hash: str = "md5") -> DataFrame:
    """Keep each row of stratum ``s`` with probability ``rates[s]``,
    deterministically in the row id.  Strata absent from ``rates`` fall back
    to ``default_rate`` (0.0 = drop, the curation default).

    Plan shape: broadcast-join of the tiny rate table onto the fact rows +
    a map-only filter — no shuffle of the corpus, survives any scale-up.
    ``hash`` picks the oracle (md5) or production (xxhash64) twin; both
    are deterministic in the id, so retries keep the same sample.
    """
    spark = df.sparkSession
    rate_rows = [(k, int(min(max(v, 0.0), 1.0) * HASH_SPACE))
                 for k, v in rates.items()]
    rtab = spark.createDataFrame(rate_rows, f"{strata_col} string, __thr long")
    dflt = int(min(max(default_rate, 0.0), 1.0) * HASH_SPACE)
    return (df.join(F.broadcast(rtab), strata_col, "left")
            .where(_hash_u32(id_col, hash) < F.coalesce("__thr", F.lit(dflt)))
            .drop("__thr"))


def sample_stratified_sql(table: str, rates: dict[str, float],
                          strata_col: str = "lang", id_col: str = "doc_id",
                          default_rate: float = 0.0,
                          columns: str = "*") -> str:
    """The ANSI-SQL twin of :func:`sample_stratified` (oracle generator)."""
    cases = " ".join(
        f"WHEN '{k}' THEN {int(min(max(v, 0.0), 1.0) * HASH_SPACE)}"
        for k, v in rates.items())
    dflt = int(min(max(default_rate, 0.0), 1.0) * HASH_SPACE)
    return f"""
        SELECT {columns} FROM {table}
        WHERE ('0x' || substring(md5({id_col}::VARCHAR), 1, 8))::BIGINT
              < (CASE {strata_col} {cases} ELSE {dflt} END)"""


def mix_proportions(df: DataFrame, targets: dict[str, float],
                    strata_col: str = "lang",
                    id_col: str = "doc_id",
                    hash: str = "md5") -> DataFrame:
    """Rebalance the corpus to target mixture proportions by downsampling.

    Finds the largest total size ``T`` such that every stratum can supply
    its share (``T = min over s of count(s) / target(s)``), then keeps each
    stratum at rate ``target(s) * T / count(s)`` — at most one stratum
    survives whole; the rest are hash-downsampled.  Strata not named in
    ``targets`` are dropped.

    Cost: one count aggregation over the corpus (map-side combine on the
    stratum key — bytes shuffled = O(strata), not O(rows)), then the same
    broadcast-join + map-only filter as :func:`sample_stratified`.
    """
    cnt = {r[strata_col]: r["n"]
           for r in (df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("n"))
                     .collect())}
    rates = _mix_rates(cnt, targets)
    return sample_stratified(df, rates, strata_col, id_col,
                             default_rate=0.0, hash=hash)


def top_k_by(df: DataFrame, k: int, part_col: str, order_cols,
             id_col: str = "doc_id", salts: int = 32) -> DataFrame:
    """Per-group top-k selection (e.g. keep the k highest-quality documents
    per domain).  Appends a ``rnk`` column (1-based) and filters to ≤ k.
    Ties break on ``id_col`` so the selection is total-ordered and
    deterministic across engines and retries.

    Two-phase to survive low-cardinality group keys (a handful of domains
    over 100 TB would otherwise funnel each whole group through ONE window
    task): phase 1 ranks within (group, salt) — ``salts`` parallel tasks
    per group, each keeping its local top-k — and phase 2 ranks the
    ≤ k·salts survivors per group, a bounded-size window.  The result is
    identical to the single-window form: every global top-k row is within
    the top-k of its own salt bucket, so phase 1 never discards one."""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(id_col).cast("string")),
                         F.lit(salts)))
    w1 = Window.partitionBy(part_col, "__salt").orderBy(
        *order_cols, F.asc(id_col))
    cand = (salted.withColumn("__r1", F.row_number().over(w1))
            .where(F.col("__r1") <= k).drop("__r1", "__salt"))
    w2 = Window.partitionBy(part_col).orderBy(*order_cols, F.asc(id_col))
    return (cand.withColumn("rnk", F.row_number().over(w2))
            .where(F.col("rnk") <= k))


def mix_proportions_sql(table: str, targets: dict[str, float],
                        strata_col: str = "lang", id_col: str = "doc_id",
                        columns: str = "d.*") -> str:
    """ANSI-SQL twin of :func:`mix_proportions` — counts, the achievable
    total, and per-stratum rates are all derived in CTEs so the oracle
    tracks the data at any scale factor.  The float expressions mirror
    :func:`_mix_rates` operation-for-operation (n/t, min, t*total/n, *2^32,
    floor) so both engines compute bit-identical IEEE doubles and therefore
    the identical keep set."""
    values = ", ".join(f"('{s}', {t!r}::DOUBLE)" for s, t in targets.items())
    return f"""
        WITH tg({strata_col}, t) AS (VALUES {values}),
        cnt AS (SELECT {strata_col}, count(*)::DOUBLE AS n
                FROM {table}
                WHERE {strata_col} IN (SELECT {strata_col} FROM tg)
                GROUP BY {strata_col}),
        tot AS (SELECT min(n / t) AS total
                FROM cnt JOIN tg USING ({strata_col}) WHERE t > 0),
        rates AS (SELECT {strata_col},
                         least(1.0, t * (SELECT total FROM tot) / n) AS rate
                  FROM cnt JOIN tg USING ({strata_col}))
        SELECT {columns} FROM {table} d JOIN rates r USING ({strata_col})
        WHERE ('0x' || substring(md5(d.{id_col}::VARCHAR), 1, 8))::BIGINT
              < floor(r.rate * 4294967296.0)::BIGINT"""


def pack_sequences(df: DataFrame, budget: int, text_col: str = "text",
                   id_col: str = "doc_id", shard_col: str = "lang",
                   token_re: str = r"\S+") -> DataFrame:
    """Concat-and-chunk sequence packing — the standard LLM-pretraining
    transform: documents within a shard are concatenated in deterministic
    ``id_col`` order and the token stream is cut every ``budget`` tokens
    (documents may straddle a cut).  Emits, per document,

        (id, shard, n_tokens, seq_first, seq_last, seq_offset)

    — the first/last sequence the document lands in and its token offset
    inside ``seq_first`` — which lets a downstream tokenizer slice each
    fixed-length sequence deterministically WITHOUT ever materializing the
    concatenated stream.

    Scale shape: one window partitioned by the shard key (never a global
    no-partition window — that funnels the corpus through one task).  At
    100 TB the shard key should be (domain, hash_bucket) so every window
    fits a single task; packing is embarrassingly parallel across shards
    and the output is pure per-row arithmetic over one running sum.
    """
    tok = F.size(F.regexp_extract_all(
        F.col(text_col), F.lit(token_re), 0)).cast("long")
    w = Window.partitionBy(shard_col).orderBy(id_col)
    base = df.select(F.col(id_col), F.col(shard_col), tok.alias("n_tokens"))
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens"))
    first = F.floor(start / budget).cast("long")
    return (base.withColumn("cum", cum)
            .select(id_col, shard_col, "n_tokens",
                    first.alias("seq_first"),
                    F.greatest(first, F.floor((F.col("cum") - 1) / budget)
                               .cast("long")).alias("seq_last"),
                    (start % budget).cast("long").alias("seq_offset")))


def pack_sequences_sql(table: str, budget: int, text_col: str = "text",
                       id_col: str = "doc_id", shard_col: str = "lang",
                       token_re: str = r"\S+") -> str:
    """ANSI-SQL twin of :func:`pack_sequences` (oracle generator)."""
    return f"""
        WITH t AS (SELECT {id_col}, {shard_col},
                          len(regexp_extract_all({text_col},
                              '{token_re}'))::BIGINT AS n_tokens
                   FROM {table}),
        c AS (SELECT {id_col}, {shard_col}, n_tokens,
                     SUM(n_tokens) OVER (PARTITION BY {shard_col}
                                         ORDER BY {id_col})::BIGINT AS cum
              FROM t)
        SELECT {id_col}, {shard_col}, n_tokens,
               ((cum - n_tokens) // {budget})::BIGINT AS seq_first,
               greatest((cum - n_tokens) // {budget},
                        (cum - 1) // {budget})::BIGINT AS seq_last,
               ((cum - n_tokens) % {budget})::BIGINT AS seq_offset
        FROM c"""


def _mix_rates(counts: dict[str, int],
               targets: dict[str, float]) -> dict[str, float]:
    """Per-stratum keep rates hitting ``targets`` exactly (shared by the
    Spark path and the SQL-oracle generator so both filter identically)."""
    have = {s: counts.get(s, 0) for s in targets}
    if any(n == 0 for n in have.values()):
        missing = [s for s, n in have.items() if n == 0]
        raise ValueError(f"strata with no rows cannot meet a target: {missing}")
    total = min(have[s] / t for s, t in targets.items() if t > 0)
    return {s: min(1.0, t * total / have[s]) for s, t in targets.items()}
