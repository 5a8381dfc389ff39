"""Deterministic synthetic source-code table generator (FIXTURES.md §1).

Schema: ``repo:string, path:string, commit:string, lang:string,
content:string`` — the engine's primary input shape (BASELINE.json
``input_hint``). Properties engineered to exercise every codec:

- ``repo``: ~50 values, Zipf-skewed, one giant repo holding ~40% of rows
  (exercises salted repartitioning);
- ``path``: hierarchical, sorted within a repo (front-coding / RLE prey);
- ``commit``: 40-char hex, ~5 distinct per repo (dictionary prey);
- ``lang``: ~12 values correlated with the path extension (dictionary prey);
- ``content``: seeded token sampling over keyword/identifier/punctuation
  vocabularies with unicode + edge rows (FSST/zstd prey).

Determinism: every row is a pure function of ``(seed, row_id, n_rows)``.
Rows are generated in aligned 8192-row blocks, each with its own
counter-based ``np.random.Philox`` stream — so ANY partitioning of the id
space (pandas slice or Spark range partitions) yields bit-identical rows.
Content assembly is fully vectorized (token-LUT gather, no per-row joins).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

BLOCK = 8192

N_REPOS = 50
GIANT_SHARE = 0.4
COMMITS_PER_REPO = 5

LANGS = [
    ("python", ".py"), ("java", ".java"), ("c", ".c"), ("go", ".go"),
    ("rust", ".rs"), ("javascript", ".js"), ("typescript", ".ts"),
    ("cpp", ".cc"), ("ruby", ".rb"), ("shell", ".sh"), ("html", ".html"),
    ("markdown", ".md"),
]

_KEYWORDS = (
    "def return if else for while import from class try except with as "
    "lambda yield pass break continue not and or in is None True False "
    "public static void int float string var let const function struct "
    "impl fn match pub use mod async await select insert update delete"
).split()
_PUNCT = list("(){}[]:;,.=+-*/<>&|!\n\n\n    ") + ["\n    ", " = ", "():\n", "->", "=="]
_UNICODE = ["héllo", "wörld", "日本語", "données", "переменная", "🎉"]


def _build_vocab(seed: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (lut bytes matrix (V, W), lengths, sampling cdf) — all np."""
    rng = np.random.default_rng(seed)
    idents = [
        f"{p}_{rng.integers(0, 99999):05d}"
        for p in ("var", "tmp", "result", "data", "value", "count", "node", "item")
        for _ in range(150)
    ]
    vocab = [w + " " for w in _KEYWORDS * 20] + _PUNCT * 40 + [w + " " for w in idents] + _UNICODE
    enc = [v.encode() for v in vocab]
    width = max(len(b) for b in enc)
    lut = np.zeros((len(enc), width), dtype=np.uint8)
    lens = np.zeros(len(enc), dtype=np.int64)
    for i, b in enumerate(enc):  # vocab-size loop (≈3k), not data-size
        lut[i, : len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = len(b)
    # zipf-ish sampling weights over a shuffled vocab
    w = 1.0 / np.arange(1, len(enc) + 1) ** 0.7
    rng.shuffle(w)
    cdf = np.cumsum(w / w.sum())
    return lut, lens, cdf


def repo_boundaries(n_rows: int) -> np.ndarray:
    """Row-id boundaries per repo: repo 0 is the giant (~40% of rows)."""
    weights = np.ones(N_REPOS)
    weights[0] = 0.0
    zipf = 1.0 / np.arange(1, N_REPOS) ** 1.1
    weights[1:] = (1 - GIANT_SHARE) * zipf / zipf.sum()
    weights[0] = GIANT_SHARE
    counts = np.floor(weights * n_rows).astype(np.int64)
    counts[0] += n_rows - counts.sum()
    return np.concatenate([[0], np.cumsum(counts)])


def _commit_hex(seed: int) -> list[list[str]]:
    rng = np.random.default_rng(seed + 7)
    return [
        ["%040x" % int.from_bytes(rng.bytes(20), "big") for _ in range(COMMITS_PER_REPO)]
        for _ in range(N_REPOS)
    ]


def _gen_block(block_idx: int, start: int, count: int, n_rows: int, seed: int,
               lut: np.ndarray, lens: np.ndarray, cdf: np.ndarray,
               bounds: np.ndarray, commits: list[list[str]],
               avg_tokens: int) -> pd.DataFrame:
    rng = np.random.default_rng(np.random.Philox(key=[seed, block_idx]))
    ids = np.arange(start, start + count, dtype=np.int64)

    repo_idx = np.searchsorted(bounds, ids, side="right") - 1
    within = ids - bounds[repo_idx]
    repos = np.array([f"org{i // 10}/repo{i}" for i in range(N_REPOS)])[repo_idx]

    lang_idx = (within // 16) % len(LANGS)
    langs = np.array([l for l, _ in LANGS])[lang_idx]
    exts = np.array([e for _, e in LANGS])[lang_idx]
    a, b, c = within // 1600, (within // 160) % 10, within % 160
    paths = np.char.add(
        np.char.add(
            np.char.add("src/module", a.astype(str)),
            np.char.add("/sub", b.astype(str)),
        ),
        np.char.add(np.char.add("/file", c.astype(str)), exts),
    )

    with np.errstate(over="ignore"):
        cidx = ((ids.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(17)) % COMMITS_PER_REPO
    cidx = cidx.astype(np.int64)
    commit_tab = np.array(commits)  # (N_REPOS, COMMITS_PER_REPO)
    commit_vals = commit_tab[repo_idx, cidx]

    # content: vectorized token assembly
    ntok = np.clip(
        rng.lognormal(mean=np.log(avg_tokens), sigma=1.0, size=count), 4, avg_tokens * 40
    ).astype(np.int64)
    # edge rows at the start of the dataset
    for off, v in ((0, 0), (1, 1), (2, avg_tokens * 40)):
        if start <= off < start + count:
            ntok[off - start] = v
    total = int(ntok.sum())
    tok_ids = np.searchsorted(cdf, rng.random(total))
    tok_lens = lens[tok_ids]
    row_of_tok = np.repeat(np.arange(count), ntok)
    row_bytes = np.zeros(count, dtype=np.int64)
    np.add.at(row_bytes, row_of_tok, tok_lens)
    # gather: (total, W) matrix -> mask -> flat byte stream
    mat = lut[tok_ids]
    mask = np.arange(lut.shape[1])[None, :] < tok_lens[:, None]
    flat = mat[mask]
    offsets = np.zeros(count + 1, dtype=np.int64)
    np.cumsum(row_bytes, out=offsets[1:])
    content = pa.Array.from_buffers(
        pa.large_string() if offsets[-1] > np.iinfo(np.int32).max else pa.string(),
        count,
        [None, pa.py_buffer(offsets.astype(np.int64 if offsets[-1] > np.iinfo(np.int32).max else np.int32).tobytes()),
         pa.py_buffer(flat.tobytes())],
    )

    return pd.DataFrame(
        {
            "repo": repos,
            "path": paths,
            "commit": commit_vals,
            "lang": langs,
            "content": content.to_pandas(),
        }
    )


def gen_rows(start: int, count: int, n_rows: int, seed: int = 42,
             avg_tokens: int = 80) -> pd.DataFrame:
    """Rows [start, start+count) of the n_rows-row dataset — deterministic."""
    lut, lens, cdf = _build_vocab(seed)
    bounds = repo_boundaries(n_rows)
    commits = _commit_hex(seed)
    frames = []
    end = min(start + count, n_rows)
    for block_idx in range(start // BLOCK, (end + BLOCK - 1) // BLOCK):
        block_start = block_idx * BLOCK
        block_count = min(BLOCK, n_rows - block_start)
        full = _gen_block(block_idx, block_start, block_count, n_rows, seed,
                          lut, lens, cdf, bounds, commits, avg_tokens)
        lo = max(start, block_start) - block_start
        hi = min(end, block_start + block_count) - block_start
        frames.append(full.iloc[lo:hi])
    return pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
        columns=["repo", "path", "commit", "lang", "content"]
    )


def gen_pandas(n_rows: int, seed: int = 42, avg_tokens: int = 80) -> pd.DataFrame:
    return gen_rows(0, n_rows, n_rows, seed=seed, avg_tokens=avg_tokens)


def gen_spark(spark, n_rows: int, seed: int = 42, partitions: int | None = None,
              avg_tokens: int = 80):
    """Distributed generation: spark.range → mapInArrow, deterministic for
    any range partitioning because blocks are aligned to global row ids."""
    from pyspark.sql import types as T

    partitions = partitions or spark.sparkContext.defaultParallelism
    schema = T.StructType(
        [
            T.StructField("repo", T.StringType(), False),
            T.StructField("path", T.StringType(), False),
            T.StructField("commit", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
            T.StructField("content", T.StringType(), False),
        ]
    )

    def gen_iter(batches):
        for batch in batches:
            ids = batch.column("id").to_numpy()
            if len(ids) == 0:
                continue
            pdf = gen_rows(int(ids[0]), len(ids), n_rows, seed=seed, avg_tokens=avg_tokens)
            yield pa.RecordBatch.from_pandas(pdf, preserve_index=False)

    return (
        spark.range(0, n_rows, 1, partitions)
        .mapInArrow(gen_iter, schema=schema)
    )
