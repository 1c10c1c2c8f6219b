"""Deterministic synthetic source-code table generator.

Produces the ``(repo, path, commit, lang, content)`` table of BASELINE.json's
input_hint at any scale, with a skewed (zipf-ish) repo-size distribution plus
one or two mega-repos — the shape needed to exercise the salted-split skew
handling of the north rule.  No external data; everything derives from a seed.

Determinism is *partition-independent*: every value is a pure function of the
global row index via a splitmix64-style mixer, so generating rows [0, n) in
any partitioning (pandas batch, Spark ``spark.range``-driven mapInPandas, or
two different cluster sizes) yields byte-identical rows.  No per-row Python:
string assembly goes through Arrow ``binary_join_element_wise`` /
``binary_join`` kernels.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_SEED = 42

LANGS = ["python", "javascript", "go", "java", "rust", "c", "ruby", "markdown"]
_EXT = {"python": ".py", "javascript": ".js", "go": ".go", "java": ".java",
        "rust": ".rs", "c": ".c", "ruby": ".rb", "markdown": ".md"}

_IDENT = ["data", "value", "result", "config", "ctx", "item", "node", "state",
          "buf", "key", "index", "count", "name", "path", "req", "resp",
          "client", "server", "parser", "writer", "reader", "cache", "pool",
          "queue", "token", "batch", "frame", "block", "chunk", "offset",
          "handler", "worker"]

_LINE_TMPL = {
    "python": [
        "def {a}_{b}({c}):", "    return {a}.{b}({c})", "    {a} = {b}[{c}]",
        "import {a}", "from {a} import {b}", "class {a}:",
        "    if {a} is None:", "        raise ValueError({b})",
        "    for {a} in {b}:", "        {c}.append({a})",
        "# {a} {b} {c}", "", "    with open({a}) as {b}:",
        "    {a} += {b} * {c}", "    yield {a}", "    return None",
    ],
    "javascript": [
        "function {a}({b}) {{", "  const {a} = {b}.{c};", "  return {a};",
        "}}", "export default {a};", "let {a} = new {b}({c});",
        "  if ({a} === {b}) {{", "  {a}.push({b});", "// {a} {b}",
        "const {{ {a}, {b} }} = require('{c}');", "",
    ],
    "go": [
        "func {a}({b} string) error {{", "\treturn {a}.{b}({c})", "}}",
        "package {a}", "import \"{a}\"", "\tif {a} != nil {{",
        "\t\treturn {b}", "\t}}", "var {a} = {b}{{}}", "// {a} {b} {c}",
        "\tfor _, {a} := range {b} {{", "",
    ],
    "java": [
        "public class {a} {{", "    private {b} {a};",
        "    public {b} get{c}() {{", "        return {a};", "    }}", "}}",
        "import java.util.{a};", "    {a}.add({b});", "// {a} {b}", "",
    ],
    "rust": [
        "fn {a}({b}: &str) -> {c} {{", "    let {a} = {b}.{c}();", "}}",
        "use {a}::{b};", "    match {a} {{", "        Some({b}) => {c},",
        "    }}", "pub struct {a} {{", "    {b}: {c},", "// {a} {b}", "",
    ],
    "c": [
        "int {a}_{b}(char *{c}) {{", "    return {a};", "}}",
        "#include <{a}.h>", "    if ({a} == NULL) {{", "    }}",
        "static int {a} = 0;", "    {a} = {b}[{c}];", "/* {a} {b} */", "",
    ],
    "ruby": [
        "def {a}_{b}({c})", "  {a} = {b}[{c}]", "end", "require '{a}'",
        "class {a}", "  attr_reader :{b}", "  {a}.each do |{b}|",
        "# {a} {b}", "",
    ],
    "markdown": [
        "# {a}", "## {a} {b}", "The {a} uses {b} to process {c}.",
        "- {a}: {b}", "```", "{a} {b} {c}", "",
        "See [{a}]({b}.md) for {c}.",
    ],
}


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized uint64 mixing."""
    z = x.astype(np.uint64, copy=True)
    z += np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _mix64s(x: int) -> int:
    """Scalar splitmix64 in pure-python ints (no numpy overflow warnings)."""
    M = (1 << 64) - 1
    z = (x + 0x9E3779B97F4A7C15) & M
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M
    return z ^ (z >> 31)


def _stream(idx: np.ndarray, seed: int, stream: int) -> np.ndarray:
    key = _mix64s((seed + stream * 0x9E3779B9) & ((1 << 64) - 1))
    return _mix64(idx.astype(np.uint64) ^ np.uint64(key))


def _repo_cdf(n_repos: int) -> np.ndarray:
    """Zipf tail with an explicit skewed head: repo0 ~25% of all files,
    repo1 ~10% — the mega-repo shape the salting policy must handle."""
    ranks = np.arange(1, n_repos + 1, dtype=np.float64)
    w = 1.0 / ranks
    if n_repos > 2:
        tail = w[2:].sum()
        w[0] = tail * (0.25 / 0.65)
        w[1] = tail * (0.10 / 0.65)
    cdf = np.cumsum(w)
    return cdf / cdf[-1]


def _line_pool(lang: str, seed: int) -> np.ndarray:
    """~512 distinct deterministic code lines per language."""
    tmpls = _LINE_TMPL[lang]
    out = []
    k = np.arange(512, dtype=np.uint64)
    a = _stream(k, seed, 101) % np.uint64(len(_IDENT))
    b = _stream(k, seed, 102) % np.uint64(len(_IDENT))
    c = _stream(k, seed, 103) % np.uint64(len(_IDENT))
    t = _stream(k, seed, 104) % np.uint64(len(tmpls))
    for i in range(512):
        out.append(tmpls[int(t[i])].format(
            a=_IDENT[int(a[i])], b=_IDENT[int(b[i])], c=_IDENT[int(c[i])]))
    return np.array(out, dtype=object)


_POOL_CACHE: dict[int, pa.Array] = {}
_REPO_CACHE: dict[tuple[int, int], pa.Array] = {}


def _all_pools(seed: int) -> pa.Array:
    """All languages' line pools concatenated: lang li occupies [li*512, li*512+512)."""
    if seed not in _POOL_CACHE:
        flat = np.concatenate([_line_pool(lg, seed) for lg in LANGS])
        _POOL_CACHE[seed] = pa.array(flat, type=pa.string())
    return _POOL_CACHE[seed]


def _repo_names(n_repos: int, seed: int) -> pa.Array:
    """repo_id -> "org/repoN" string pool (computed once)."""
    key = (n_repos, seed)
    if key not in _REPO_CACHE:
        org = ["acme", "globex", "initech", "umbrella", "hooli",
               "stark", "wayne", "tyrell"]
        rid = np.arange(n_repos, dtype=np.uint64)
        oid = _mix64(rid ^ np.uint64(seed + 5)) % np.uint64(len(org))
        _REPO_CACHE[key] = pa.array(
            [f"{org[int(o)]}/repo{r}" for r, o in enumerate(oid)], type=pa.string())
    return _REPO_CACHE[key]


def _hex40(idx: np.ndarray, seed: int) -> pa.Array:
    """Vectorized 40-hex commit ids: 20 bytes per row -> hexlify whole buffer."""
    import binascii

    h1 = _stream(idx, seed, 7)
    h2 = _stream(idx, seed, 8)
    h3 = (_stream(idx, seed, 9) & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    buf = np.empty(len(idx), dtype=[("a", "<u8"), ("b", "<u8"), ("c", "<u4")])
    buf["a"], buf["b"], buf["c"] = h1, h2, h3
    hexed = binascii.hexlify(buf.tobytes())
    return pa.array(np.frombuffer(hexed, dtype="S40")).cast(pa.string())


def generate_arrow(start: int, count: int, seed: int = DEFAULT_SEED,
                   n_repos: int = 200, lines_lo: int = 4,
                   lines_hi: int = 120) -> pa.Table:
    """Rows [start, start+count) of the deterministic code table (arrow)."""
    idx = np.arange(start, start + count, dtype=np.uint64)
    cdf = _repo_cdf(n_repos)

    u_repo = _stream(idx, seed, 1).astype(np.float64) / 2**64
    repo_id = np.searchsorted(cdf, u_repo, side="right").astype(np.int64)

    # language: repo-dominant with 20% spill to a random language
    dom = (_mix64(repo_id.astype(np.uint64) ^ np.uint64(seed)) % np.uint64(len(LANGS))).astype(np.int64)
    spill = _stream(idx, seed, 2) % np.uint64(5) == 0
    rand_lang = (_stream(idx, seed, 3) % np.uint64(len(LANGS))).astype(np.int64)
    lang_id = np.where(spill, rand_lang, dom)
    lang = pc.take(pa.array(LANGS, type=pa.string()), pa.array(lang_id))

    repo = pc.take(_repo_names(n_repos, seed), pa.array(repo_id))

    # path: src/<dir>/<name><n><ext> — all pieces gathered from tiny pools
    dirs = pa.array(["core", "util", "api", "internal", "lib", "cmd",
                     "pkg", "services", "models", "tests"], type=pa.string())
    d = (_stream(idx, seed, 4) % np.uint64(len(dirs))).astype(np.int64)
    nm = (_stream(idx, seed, 5) % np.uint64(len(_IDENT))).astype(np.int64)
    fileno = (_stream(idx, seed, 6) % np.uint64(97)).astype(np.int64)
    nums = pa.array([str(i) for i in range(97)], type=pa.string())
    ident = pa.array(_IDENT, type=pa.string())
    ext = pa.array([_EXT[l] for l in LANGS], type=pa.string())
    path = pc.binary_join_element_wise(
        "src",
        pc.take(dirs, pa.array(d)),
        pc.binary_join_element_wise(
            pc.take(ident, pa.array(nm)),
            pc.take(nums, pa.array(fileno)),
            pc.take(ext, pa.array(lang_id)), ""),
        "/")

    commit = _hex40(idx, seed)

    # content: per-row L lines drawn from the language's line pool
    span = max(lines_hi - lines_lo, 1)
    nlines = (lines_lo + (_stream(idx, seed, 10) % np.uint64(span))).astype(np.int64)
    offsets = np.zeros(count + 1, dtype=np.int64)
    np.cumsum(nlines, out=offsets[1:])
    total = int(offsets[-1])
    row_of_line = np.repeat(idx, nlines)          # global row index per line
    line_no = np.arange(total, dtype=np.uint64) - np.repeat(offsets[:-1], nlines).astype(np.uint64)
    pick = _mix64(row_of_line ^ _mix64(line_no + np.uint64(seed * 1315423911))) % np.uint64(512)
    # global pool index: lang block offset + per-line pick
    lang_per_line = np.repeat(lang_id, nlines)
    gidx = (lang_per_line * 512 + pick.astype(np.int64))
    flat_arr = pc.take(_all_pools(seed), pa.array(gidx))
    off_t = pa.int32() if total < 2**31 else pa.int64()
    list_arr = pa.ListArray.from_arrays(pa.array(offsets, type=off_t), flat_arr)
    content = pc.binary_join(list_arr, "\n")

    return pa.table({"repo": repo, "path": path, "commit": commit,
                     "lang": lang, "content": content})


def generate_batch(start: int, count: int, seed: int = DEFAULT_SEED,
                   n_repos: int = 200, lines_lo: int = 4,
                   lines_hi: int = 120) -> pd.DataFrame:
    return generate_arrow(start, count, seed, n_repos, lines_lo,
                          lines_hi).to_pandas()


def code_table(spark, n_rows: int, seed: int = DEFAULT_SEED, n_repos: int = 200,
               partitions: int | None = None, lines_hi: int = 120):
    """Distributed deterministic code table as a Spark DataFrame.

    Built over ``spark.range`` + ``mapInPandas`` so generation itself scales
    out; values depend only on the global row id, never on partitioning.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType([StructField(c, StringType()) for c in
                         ("repo", "path", "commit", "lang", "content")])

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            if len(ids) == 0:
                continue
            # ids from spark.range are contiguous per batch slice; generate
            # by explicit index so any split is fine
            yield generate_batch_for_ids(ids, seed, n_repos, lines_hi=lines_hi)

    rng_df = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(gen, schema)


def generate_batch_for_ids(ids: np.ndarray, seed: int = DEFAULT_SEED,
                           n_repos: int = 200, lines_hi: int = 120) -> pd.DataFrame:
    """Same as generate_batch but for an arbitrary id array (non-contiguous ok)."""
    ids = np.asarray(ids, dtype=np.int64)
    if len(ids) == 0:
        return generate_batch(0, 0, seed, n_repos, lines_hi=lines_hi)
    # generate_batch is written in terms of a contiguous range; re-express it
    # over arbitrary ids by calling the index-pure helpers directly
    lo = int(ids.min())
    if np.array_equal(ids, np.arange(lo, lo + len(ids))):
        return generate_batch(lo, len(ids), seed, n_repos, lines_hi=lines_hi)
    parts = []
    splits = np.where(np.diff(ids) != 1)[0] + 1
    for chunk in np.split(ids, splits):
        parts.append(generate_batch(int(chunk[0]), len(chunk), seed, n_repos,
                                    lines_hi=lines_hi))
    return pd.concat(parts, ignore_index=True)
