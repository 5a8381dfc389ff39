"""Stats-driven per-chunk codec auto-selection.

The analog of the reference's evidence-driven ``_dense`` demotion (keep
nested only when the data proves it's needed, reference
fhirflat/fhir2flat.py:56-61 + resources/base.py:278-291): cheap sampled
statistics pick the codec, and for content-like strings the two finalists
(fsst, zstd) are *race-tested* on a bounded sample — measured ratio, not
guesswork, decides.

All statistics come from pyarrow C++ compute or numpy — nothing here loops
over rows in Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from fhirflat_spark.codecs import fsst as fsst_mod
from fhirflat_spark.codecs.core import string_parts
from fhirflat_spark.codecs.kernels import _zstd, prefix_viable

_TRIAL_SAMPLE = 1 << 16  # 64 KiB trial-compression sample
_DICT_MAX = 1 << 16
# archive profile, level-by-volume: chunks carrying this many string
# bytes get a higher zstd level — the dominant byte stream is where extra
# CPU buys footprint (measured on synthetic code content, 13 MB chunk:
# L3 0.310 @ 139 MB/s, L9 0.297 @ 27 MB/s, L12 0.283 @ 11 MB/s per
# core). Full-dataset transcode sweep (1M rows, local[8], r3): L9
# 249.2 MB @ 15.7 s, L12 237.5 MB @ 23 s (0.902 of parquet/zstd-L3),
# L15 220.2 MB @ 114 s — L12 is the archive default (best ratio-per-CPU
# under the <=0.92 footprint target; L15's extra 7% costs 7x the wall).
# Gated behind opts["archive"] so the default profile keeps encode
# faster than a parquet/zstd write at near-identical footprint.
_BIG_CHUNK_BYTES = 2 << 20
_BIG_CHUNK_LEVEL = 12
# fsst must beat zstd's measured ratio by this factor to win the race —
# just enough margin to keep near-ties from flapping between runs. The
# r1-r3 edge (0.85) priced in a ~10x-slower pure-Python matcher; the r4
# tile coder runs at numpy bandwidth (measured 160 MB/s enc / 540 MB/s
# dec on hex vs zstd's 150/870), so a strict ratio win is the honest
# criterion. fsst's natural margin on its winning corpora
# (complete-coverage alphabets like hex ids: 0.500 vs zstd 0.520) is
# only 1-5%, which a 3%+ edge would wrongly erase.
_FSST_EDGE = 0.995


def _is_stringlike(t: pa.DataType) -> bool:
    return (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    )


_STATS_SAMPLE_ROWS = 2048


def column_stats(arr: pa.Array) -> dict:
    """Cheap chunk-level stats used by choose_codec (and by the manifest).

    For long-string columns (content-like) the distinct/run/sorted stats
    run on a row sample — hashing multiple MB per chunk just to decide a
    codec would rival the cost of the encode itself. Scaled-up sample
    counts keep the selector thresholds comparable.
    """
    n = len(arr)
    st: dict = {"n": n}
    if n == 0:
        return {"n": 0, "distinct": 0, "runs": 0, "sorted": True, "bytes": 0}
    stat_arr, scale = arr, 1.0
    if _is_stringlike(arr.type) and n > _STATS_SAMPLE_ROWS:
        total = pc.sum(pc.binary_length(arr).cast(pa.int64())).as_py() or 0
        if total / n > 64:  # long strings: sample a contiguous slice
            stat_arr = arr.slice(0, _STATS_SAMPLE_ROWS)
            scale = n / _STATS_SAMPLE_ROWS
    m = len(stat_arr)
    st["distinct"] = min(n, int(pc.count_distinct(stat_arr).as_py() * scale))
    if m > 1:
        a, b = stat_arr.slice(0, m - 1), stat_arr.slice(1, m - 1)
        neq = pc.not_equal(a, b)
        st["runs"] = min(n, int((1 + pc.sum(neq.cast(pa.int64())).as_py()) * scale))
        st["sorted"] = bool(pc.min(pc.less_equal(a, b)).as_py())
    else:
        st["runs"] = 1
        st["sorted"] = True
    if _is_stringlike(arr.type):
        lengths = pc.binary_length(arr)
        st["bytes"] = pc.sum(lengths.cast(pa.int64())).as_py() or 0
        st["max_len"] = pc.max(lengths).as_py() or 0
        st["avg_len"] = st["bytes"] / n
    else:
        st["bytes"] = n * arr.type.bit_width // 8
        if pa.types.is_integer(arr.type):
            st["min"] = pc.min(arr).as_py()
            st["max"] = pc.max(arr).as_py()
    return st


def _avg_prefix_share(arr: pa.Array, stats: dict, sample: int = 512) -> float:
    """Mean adjacent-row common-prefix length / mean length, on a sample."""
    n = len(arr)
    if n < 2 or stats.get("avg_len", 0) == 0:
        return 0.0
    k = min(n, sample)
    sub = arr.slice(0, k)
    lengths, data = string_parts(sub)
    max_len = int(lengths.max()) if k else 0
    if max_len == 0 or not prefix_viable(k, max_len):
        return 0.0
    buf = np.frombuffer(data, dtype=np.uint8)
    offsets = np.zeros(k + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    mat = np.zeros((k, max_len), dtype=np.uint8)
    row = np.repeat(np.arange(k, dtype=np.int64), lengths)
    col = np.arange(len(buf), dtype=np.int64) - np.repeat(offsets[:-1], lengths)
    mat[row, col] = buf
    eq = np.logical_and.accumulate(mat[1:] == mat[:-1], axis=1)
    pl = np.minimum(eq.sum(axis=1), np.minimum(lengths[1:], lengths[:-1]))
    return float(pl.mean() / max(lengths.mean(), 1.0))


def _trial_ratios(arr: pa.Array, try_fsst: bool = True):
    """(zstd_ratio, fsst_ratio, trained_symbols) on a bounded byte sample.

    The fsst trial is one bincount + LUT pass over the sample (the r3
    greedy-regex matcher cost ~10x the zstd trial; the r4 tile coder
    costs ~1/10th of it), so it races whenever zstd's measured ratio
    leaves any room for fsst's ~0.5 floor to win — high-ratio zstd
    columns (prose, code content) still short-circuit.
    """
    _, data = string_parts(arr)
    if len(data) <= _TRIAL_SAMPLE:
        sample = data
    else:
        # head + middle + tail slices, not just the head: chunks are
        # sorted by (repo, path, commit), so a buffer can OPEN with 64 KiB
        # of hex digests/lockfile hashes and continue with prose — a
        # head-only sample would let fsst win the race on a chunk whose
        # bulk zstd compresses 2x better. Both codecs trial the SAME
        # composite sample, so the race stays fair.
        h, q = _TRIAL_SAMPLE // 2, _TRIAL_SAMPLE // 4
        mid = (len(data) - q) // 2
        sample = data[:h] + data[mid : mid + q] + data[len(data) - q :]
    if len(sample) < 64:
        return 1.0, 1.0, None
    z_ratio = len(_zstd(sample)) / len(sample)
    if not try_fsst or z_ratio <= 0.45:
        return z_ratio, 1.0, None
    symbols = fsst_mod.train_symbols(sample)
    if len(symbols) == 0:
        return z_ratio, 1.0, None
    codes, maskb, lits, tail = fsst_mod.fsst_encode_buffer(sample, symbols)
    fsst_size = fsst_mod.fsst_encoded_size(codes, maskb, lits, tail, symbols)
    # amortize the fixed symbol table over the FULL buffer, not the
    # sample — at 64 KiB the 512 B table is 0.8% of the ratio, enough to
    # flip the race on corpora where fsst's true margin is ~1%
    table_bytes = 2 * len(symbols)
    full_bytes = max(len(data), len(sample))
    f_ratio = (fsst_size - table_bytes) / len(sample) + table_bytes / full_bytes
    return z_ratio, f_ratio, symbols


def choose_codec(
    arr: pa.Array, depth: int = 0, opts: dict | None = None
) -> tuple[str, dict]:
    """Pick (codec, opts) for a null-free physical-typed array."""
    opts = dict(opts or {})
    forced = opts.pop("force", None)
    archive = opts.pop("archive", False)
    if forced:
        return forced, opts
    n = len(arr)
    if n == 0:
        return "raw", opts
    stats = opts.pop("stats", None) or column_stats(arr)
    t = arr.type

    if stats["distinct"] == 1:
        return "constant", opts

    if _is_stringlike(t):
        if depth == 0 and stats["runs"] <= max(2, n * 0.05):
            return "rle", opts
        if depth == 0 and stats["distinct"] <= min(_DICT_MAX, max(16, n * 0.1)):
            return "dict", opts
        if (
            4 < stats.get("avg_len", 0) <= 512  # path-like, not content-like
            and prefix_viable(n, stats.get("max_len", 0))
            and _avg_prefix_share(arr, stats) > 0.3
        ):
            return "prefix", opts
        z_ratio, f_ratio, symbols = _trial_ratios(arr, try_fsst=depth == 0)
        if f_ratio < z_ratio * _FSST_EDGE and symbols is not None and len(symbols):
            opts["symbols"] = symbols
            return "fsst", opts
        if z_ratio < 0.98:
            if archive and stats["bytes"] >= _BIG_CHUNK_BYTES and "level" not in opts:
                opts["level"] = _BIG_CHUNK_LEVEL
            return "zstd", opts
        return "raw", opts

    if pa.types.is_integer(t) or pa.types.is_unsigned_integer(t):
        item_bits = t.bit_width
        if depth == 0 and stats["runs"] <= max(2, n * 0.05):
            return "rle", opts
        if stats["sorted"] and n > 2:
            return "delta", opts
        lo, hi = stats.get("min"), stats.get("max")
        if lo is not None and hi is not None:
            width = int(hi - lo).bit_length()
            if width <= item_bits * 0.75:
                return "for", opts
        if depth == 0 and stats["distinct"] <= min(_DICT_MAX, max(16, n * 0.1)):
            return "dict", opts
        return "zstd", opts

    if pa.types.is_floating(t):
        if depth == 0 and stats["distinct"] <= min(_DICT_MAX, max(16, n * 0.1)):
            return "dict", opts
        # decimal-valued floats (prices, measurements): ALP stores
        # round(x·10^e) bit-packed — typically 2-4x tighter than
        # byte-stream-split. Probe on a sample; the codec still verifies
        # every value bitwise and raises (→ fallback) past its
        # exception budget, so an unlucky sample can't lose data.
        from fhirflat_spark.codecs.kernels import alp_probe

        e, hit = alp_probe(arr.to_numpy(zero_copy_only=False))
        if hit >= 0.95:
            opts["e"] = e
            return "alp", opts
        return "bss", opts

    return "arrowz", opts
