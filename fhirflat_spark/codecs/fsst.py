"""FSST-style string compression: sampled symbol-table training + escape-free
two-stream encoding.

Design (inspired by the published FSST paper — Boncz, Neumann, Leis,
"FSST: Fast Random Access String Compression", VLDB 2020 — but a
from-scratch formulation chosen for vectorizability in Python):

- **Train** on a bounded sample of the chunk: count byte n-grams
  (2..8 bytes) via ``numpy.unique`` over sliding windows, score candidates
  by ``freq * (len-1)`` (bytes saved), keep the top ``max_symbols``.
- **Encode** the *concatenated* value buffer in one pass:
  ``re.split`` with a single capturing alternation (longest-first) does the
  greedy symbol matching entirely in C; numpy turns the parts into three
  streams — ``codes`` (1 byte per matched symbol), ``lit_lens`` (literal gap
  lengths, bit-packed), ``lit_data`` (raw literal bytes). There is no escape
  byte, so incompressible input costs ~1.02x, never 2x.
- **Decode** rebuilds the buffer with pure numpy scatter (symbols ≤ 8 bytes
  go through a (n_sym, 8) gather matrix), then splits rows by the stored
  original lengths. Symbols may span row boundaries — harmless, because row
  splitting happens on the decoded buffer.

Bit-exactness holds for arbitrary bytes (UTF-8, NUL, empty rows); the only
restriction is on *symbols*: candidates containing ``\\x00`` or ``\\xff``
are excluded from the table (they still round-trip fine as literals) so the
vectorized S8 lookup and future marker tricks stay unambiguous.

Role in the engine: the content-codec candidate trained per chunk; the
auto-selector (fhirflat_spark/selector.py) race-tests it on a sample
against zstd and picks by measured ratio — the analog of the reference's
evidence-driven ``_dense`` demotion (fhirflat/fhir2flat.py:56-61).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from fhirflat_spark.codecs.core import CodecError, string_parts, strings_from_parts

MAX_SYMBOLS = 255
MAX_SYMBOL_LEN = 8
_TRAIN_SAMPLE = 1 << 16  # 64 KiB
_MIN_GAIN = 8  # a symbol must save at least this many sample bytes


def train_symbols(sample: bytes, max_symbols: int = MAX_SYMBOLS) -> list[bytes]:
    """Pick up to ``max_symbols`` frequent 2..8-byte substrings of ``sample``."""
    if len(sample) < 4:
        return []
    buf = np.frombuffer(sample, dtype=np.uint8)
    candidates: list[tuple[int, bytes]] = []
    for length in range(2, MAX_SYMBOL_LEN + 1):
        if len(buf) <= length:
            break
        wins = np.lib.stride_tricks.sliding_window_view(buf, length)
        # stride by length//2 to cut unique() cost while keeping coverage
        step = max(1, length // 2)
        wins = np.ascontiguousarray(wins[::step])
        grams = wins.view(f"V{length}").ravel()
        uniq, counts = np.unique(grams, return_counts=True)
        gain = counts * step * (length - 1)  # approx bytes saved
        # only the top candidates per length ever matter — keep the python
        # loop off the long tail (vectorized top-k instead of gain>=min scan)
        top = min(2 * max_symbols, len(gain))
        idx = np.argpartition(gain, -top)[-top:]
        idx = idx[gain[idx] >= _MIN_GAIN]
        for g, s in zip(uniq[idx], gain[idx]):
            b = g.tobytes()
            if b"\x00" in b or b"\xff" in b:
                continue
            candidates.append((int(s), b))
    candidates.sort(key=lambda t: (-t[0], t[1]))
    out: list[bytes] = []
    seen: set[bytes] = set()
    for _, b in candidates:
        if b in seen:
            continue
        seen.add(b)
        out.append(b)
        if len(out) >= max_symbols:
            break
    return out


def _build_pattern(symbols: list[bytes]) -> re.Pattern:
    ordered = sorted(symbols, key=len, reverse=True)
    return re.compile(b"(" + b"|".join(re.escape(s) for s in ordered) + b")", re.DOTALL)


def _pack_symtab(symbols: list[bytes]) -> bytes:
    lens = bytes(len(s) for s in symbols)
    return bytes([len(symbols)]) + lens + b"".join(symbols)


def _unpack_symtab(blob) -> list[bytes]:
    mv = memoryview(blob)
    k = mv[0]
    lens = list(mv[1 : 1 + k])
    out = []
    pos = 1 + k
    for ln in lens:
        out.append(bytes(mv[pos : pos + ln]))
        pos += ln
    return out


def fsst_encode_buffer(data: bytes, symbols: list[bytes]) -> tuple[np.ndarray, np.ndarray, bytes]:
    """-> (codes uint8, lit_lens int64, lit_data). Greedy longest-first parse."""
    if not symbols or not data:
        return (
            np.empty(0, np.uint8),
            np.array([len(data)], dtype=np.int64),
            data,
        )
    pattern = _build_pattern(symbols)
    parts = pattern.split(data)  # [lit0, sym0, lit1, sym1, ..., litK]
    lits = parts[0::2]
    syms = parts[1::2]
    lit_data = b"".join(lits)
    lit_lens = np.fromiter(map(len, lits), dtype=np.int64, count=len(lits))
    if not syms:
        return np.empty(0, np.uint8), lit_lens, lit_data
    # vectorized symbol -> code lookup via sorted S8 table
    table = np.array(symbols, dtype="S8")
    order = np.argsort(table)
    sorted_tab = table[order]
    matched = np.array(syms, dtype="S8")
    pos = np.searchsorted(sorted_tab, matched)
    codes = order[pos].astype(np.uint8)
    return codes, lit_lens, lit_data


def fsst_decode_buffer(
    codes: np.ndarray, lit_lens: np.ndarray, lit_data: bytes, symbols: list[bytes]
) -> bytes:
    """Vectorized inverse: interleave lit[i], sym[i], lit[i+1], ..."""
    nsym = len(codes)
    if nsym == 0:
        return bytes(lit_data)
    lut = np.zeros((len(symbols), MAX_SYMBOL_LEN), dtype=np.uint8)
    lut_len = np.zeros(len(symbols), dtype=np.int64)
    for i, s in enumerate(symbols):  # ≤255 iterations — table size, not data size
        lut[i, : len(s)] = np.frombuffer(s, np.uint8)
        lut_len[i] = len(s)
    sym_lens = lut_len[codes]
    # piece layout: lit0 sym0 lit1 sym1 ... lit_{nsym}
    piece_lens = np.empty(2 * nsym + 1, dtype=np.int64)
    piece_lens[0::2] = lit_lens
    piece_lens[1::2] = sym_lens
    piece_off = np.zeros(2 * nsym + 2, dtype=np.int64)
    np.cumsum(piece_lens, out=piece_off[1:])
    total = int(piece_off[-1])
    out = np.empty(total, dtype=np.uint8)
    # literals
    lit_buf = np.frombuffer(lit_data, dtype=np.uint8)
    lit_off_in = np.zeros(len(lit_lens) + 1, dtype=np.int64)
    np.cumsum(lit_lens, out=lit_off_in[1:])
    dst_lit = (
        np.arange(len(lit_buf), dtype=np.int64)
        - np.repeat(lit_off_in[:-1], lit_lens)
        + np.repeat(piece_off[0::2][: len(lit_lens)], lit_lens)
    )
    out[dst_lit] = lit_buf
    # symbols: gather rows of the lut then scatter the valid prefix of each
    sym_mat = lut[codes]  # (nsym, 8)
    col = np.arange(MAX_SYMBOL_LEN, dtype=np.int64)[None, :]
    mask = col < sym_lens[:, None]
    sym_bytes = sym_mat[mask]
    sym_starts = piece_off[1::2][:nsym]
    sym_off_in = np.zeros(nsym + 1, dtype=np.int64)
    np.cumsum(sym_lens, out=sym_off_in[1:])
    dst_sym = (
        np.arange(len(sym_bytes), dtype=np.int64)
        - np.repeat(sym_off_in[:-1], sym_lens)
        + np.repeat(sym_starts, sym_lens)
    )
    out[dst_sym] = sym_bytes
    return out.tobytes()


# codec-registry adapters -----------------------------------------------------

def enc_fsst(values: pa.Array, opts: dict) -> tuple[dict, list[bytes]]:
    from fhirflat_spark.codecs.kernels import _enc_sub

    lengths, data = string_parts(values)
    symbols = opts.get("symbols")
    if symbols is None:
        symbols = train_symbols(data[:_TRAIN_SAMPLE], opts.get("max_symbols", MAX_SYMBOLS))
    if not symbols:
        raise CodecError("fsst: no viable symbols (use zstd/raw)")
    codes, lit_lens, lit_data = fsst_encode_buffer(data, symbols)
    return (
        {"nsym": len(symbols), "ncodes": int(len(codes))},
        [
            _pack_symtab(symbols),
            _enc_sub(pa.array(lengths), "for"),
            _enc_sub(pa.array(lit_lens), "for"),
            codes.tobytes(),
            lit_data,
        ],
    )


def dec_fsst(meta: dict, secs: list, n: int, dtype: pa.DataType) -> pa.Array:
    from fhirflat_spark.codecs.kernels import _dec_sub

    symbols = _unpack_symtab(secs[0])
    lengths = _dec_sub(secs[1]).to_numpy(zero_copy_only=False)
    lit_lens = _dec_sub(secs[2]).to_numpy(zero_copy_only=False)
    codes = np.frombuffer(secs[3], dtype=np.uint8)
    data = fsst_decode_buffer(codes, lit_lens, bytes(secs[4]), symbols)
    return strings_from_parts(lengths, data, dtype)
