"""Lightweight-compression codec kernels (pure numpy / pyarrow, no Spark).

Each codec is a pair of functions::

    enc(values: pa.Array, opts: dict) -> (meta: dict, sections: list[bytes])
    dec(meta: dict, sections: list[memoryview], n: int, dtype) -> pa.Array

``values`` is guaranteed null-free and physically-typed (see
``core.to_physical``); the nullable wrapper and dtype restoration live in
``fhirflat_spark.codecs.__init__``. Codecs compose: RLE's run values and
DICT's dictionary are themselves serialized sub-chunks encoded with any
other codec.

Capability crosswalk to the reference (globaldothealth/fhirflat):
- ``dict``  ~ the ``system|code`` symbol fusion of codeableConcepts
  (reference fhirflat/fhir2flat.py:118-165) generalized to hash symbol tables;
- ``constant`` / ``rle`` ~ the ``flat_defaults`` constant-column elision
  re-added on decode (reference fhirflat/resources/base.py:352-354);
- ``prefix`` (front coding) ~ RLE over sorted path prefixes;
- ``fsst``  ~ sampled-symbol-table string compression for content
  (see fhirflat_spark/codecs/fsst.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from fhirflat_spark.codecs.core import (
    CodecError,
    bit_width,
    pack_bits,
    string_parts,
    strings_from_parts,
    unpack_bits,
)

_ZSTD_LEVEL = 3


def _zstd(data: bytes, level: int = _ZSTD_LEVEL) -> bytes:
    return pa.Codec("zstd", compression_level=level).compress(data, asbytes=True)


def _unzstd(data: bytes | memoryview, raw_size: int) -> bytes:
    # no bytes(data) copy: Codec.decompress takes any buffer-protocol
    # input, and blobs here are multi-MB (the copy showed in profiles)
    return pa.Codec("zstd").decompress(data, raw_size, asbytes=True)


def _is_stringlike(t: pa.DataType) -> bool:
    return (
        pa.types.is_string(t)
        or pa.types.is_large_string(t)
        or pa.types.is_binary(t)
        or pa.types.is_large_binary(t)
    )


def _prim_np(values: pa.Array) -> np.ndarray:
    """Null-free primitive arrow array -> numpy (zero-copy where possible)."""
    return values.to_numpy(zero_copy_only=False)


# ---------------------------------------------------------------------------
# arrow IPC fallback — universal, lossless for ANY arrow type (nested incl.)
# ---------------------------------------------------------------------------

def ipc_bytes(arr: pa.Array) -> bytes:
    batch = pa.record_batch([arr], names=["v"])
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, batch.schema) as w:
        w.write_batch(batch)
    return sink.getvalue().to_pybytes()


def ipc_array(blob: bytes | memoryview) -> pa.Array:
    with pa.ipc.open_stream(pa.BufferReader(bytes(blob))) as r:
        table = r.read_all()
    return table.column(0).combine_chunks()


def enc_arrowz(values: pa.Array, opts: dict) -> tuple[dict, list[bytes]]:
    raw = ipc_bytes(values)
    return {"rawsize": len(raw)}, [_zstd(raw, opts.get("level", _ZSTD_LEVEL))]


def dec_arrowz(meta: dict, secs: list, n: int, dtype: pa.DataType) -> pa.Array:
    return ipc_array(_unzstd(secs[0], meta["rawsize"]))


# ---------------------------------------------------------------------------
# constant
# ---------------------------------------------------------------------------

def enc_constant(values: pa.Array, opts: dict) -> tuple[dict, list[bytes]]:
    if len(values) == 0:
        return {"empty": True}, [ipc_bytes(values.slice(0, 0))]
    if pc.count_distinct(values).as_py() != 1:
        raise CodecError("constant codec requires a single distinct value")
    return {}, [ipc_bytes(values.slice(0, 1))]


def dec_constant(meta: dict, secs: list, n: int, dtype: pa.DataType) -> pa.Array:
    one = ipc_array(secs[0])
    if meta.get("empty") or n == 0:
        return one.slice(0, 0)
    return one.take(pa.array(np.zeros(n, dtype=np.int64)))


# ---------------------------------------------------------------------------
# raw / zstd byte streams
# ---------------------------------------------------------------------------

def _enc_sub(values, codec: str, opts: dict | None = None, depth: int = 1) -> bytes:
    # late import to avoid a cycle with __init__ (registry lives there);
    # depth=1 keeps the auto-selector from picking dict/rle again inside a
    # dictionary/run-values sub-chunk (no unbounded recursion)
    from fhirflat_spark.codecs import encode_array

    return encode_array(values, codec=codec, opts=opts, depth=depth)


def _dec_sub(blob) -> pa.Array:
    from fhirflat_spark.codecs import decode_array

    return decode_array(blob)


def _enc_strings(values: pa.Array, opts: dict, compress: bool) -> tuple[dict, list[bytes]]:
    lengths, data = string_parts(values)
    lens_sub = _enc_sub(pa.array(lengths), "for")
    if compress:
        level = opts.get("level", _ZSTD_LEVEL)
        return (
            {"comp": "zstd", "rawsize": len(data)},
            [lens_sub, _zstd(data, level)],
        )
    return {"comp": "none"}, [lens_sub, data]


def _dec_strings(meta: dict, secs: list, n: int, dtype: pa.DataType) -> pa.Array:
    lengths = _dec_sub(secs[0]).to_numpy(zero_copy_only=False)
    data = secs[1]
    if meta.get("comp") == "zstd":
        data = _unzstd(data, meta["rawsize"])
    return strings_from_parts(lengths, data, dtype)


def enc_raw(values: pa.Array, opts: dict) -> tuple[dict, list[bytes]]:
    if _is_stringlike(values.type):
        return _enc_strings(values, opts, compress=False)
    return {"kind": "prim"}, [_prim_np(values).tobytes()]


def dec_raw(meta: dict, secs: list, n: int, dtype: pa.DataType) -> pa.Array:
    if meta.get("kind") == "prim":
        return pa.array(np.frombuffer(secs[0], dtype=dtype.to_pandas_dtype()), type=dtype)
    return _dec_strings(meta, secs, n, dtype)


def enc_zstd(values: pa.Array, opts: dict) -> tuple[dict, list[bytes]]:
    if _is_stringlike(values.type):
        return _enc_strings(values, opts, compress=True)
    raw = _prim_np(values).tobytes()
    return {"kind": "prim", "rawsize": len(raw)}, [_zstd(raw, opts.get("level", _ZSTD_LEVEL))]


def dec_zstd(meta: dict, secs: list, n: int, dtype: pa.DataType) -> pa.Array:
    if meta.get("kind") == "prim":
        raw = _unzstd(secs[0], meta["rawsize"])
        return pa.array(np.frombuffer(raw, dtype=dtype.to_pandas_dtype()), type=dtype)
    return _dec_strings(meta, secs, n, dtype)


# ---------------------------------------------------------------------------
# byte-stream-split (floats) + zstd — parquet BYTE_STREAM_SPLIT analog
# ---------------------------------------------------------------------------

def enc_bss(values: pa.Array, opts: dict) -> tuple[dict, list[bytes]]:
    v = _prim_np(values)
    if v.dtype not in (np.float64, np.float32):
        raise CodecError("bss codec is float-only")
    w = v.dtype.itemsize
    planes = np.ascontiguousarray(v.view(np.uint8).reshape(-1, w).T)
    raw = planes.tobytes()
    return {"rawsize": len(raw)}, [_zstd(raw, opts.get("level", _ZSTD_LEVEL))]


def dec_bss(meta: dict, secs: list, n: int, dtype: pa.DataType) -> pa.Array:
    raw = _unzstd(secs[0], meta["rawsize"])
    npdt = np.dtype(dtype.to_pandas_dtype())
    w = npdt.itemsize
    planes = np.frombuffer(raw, dtype=np.uint8).reshape(w, -1)
    v = np.ascontiguousarray(planes.T).reshape(-1).view(npdt)
    return pa.array(v, type=dtype)


# ---------------------------------------------------------------------------
# ALP-style adaptive lossless float (decimal-scaled ints + exceptions)
# ---------------------------------------------------------------------------
# The ALP idea (Afroozeh & Boncz, "ALP: Adaptive Lossless floating-Point
# compression", public SIGMOD'24 paper): most real-world doubles are
# decimals — x == round(x · 10^e) / 10^e bit-exactly for some small e —
# so store the integers (FoR/bit-packed, tiny) plus a patch list of the
# values that aren't exact. This simplified single-factor variant probes
# e on a sample; the full encode verifies EVERY value bitwise, so the
# codec is lossless by construction regardless of the probe.

_ALP_MAX_E = 14  # beyond ~14 decimal digits float64 noise dominates
_ALP_INT_LIMIT = float(1 << 51)  # |scaled| bound: exact int in a double


def _alp_exact_ints(w: np.ndarray, e: int) -> tuple[np.ndarray, np.ndarray]:
    """(int64 candidates, bitwise-exact mask) for scale 10^e over float64
    ``w``. The exactness test uses the same expression decode uses
    (ints / 10^e), compared on the raw bit patterns so -0.0/NaN never
    alias."""
    p = 10.0 ** e
    with np.errstate(invalid="ignore", over="ignore"):
        scaled = w * p
        in_range = np.isfinite(scaled) & (np.abs(scaled) < _ALP_INT_LIMIT)
        ints = np.where(in_range, np.round(scaled), 0.0).astype(np.int64)
        back = ints / p
    exact = in_range & (back.view(np.int64) == w.view(np.int64))
    return ints, exact


def alp_probe(v: np.ndarray, sample: int = 1024) -> tuple[int, float]:
    """Best exponent + exact-hit rate on a sample (selector trial)."""
    w = v.astype(np.float64, copy=False)
    if len(w) > sample:
        w = w[:: max(1, len(w) // sample)][:sample]
    if len(w) == 0:
        return 0, 1.0
    best_e, best_hit = 0, -1.0
    for e in range(_ALP_MAX_E + 1):
        _, exact = _alp_exact_ints(w, e)
        hit = float(exact.mean())
        if hit > best_hit + 1e-9:  # ties → smallest e (smallest ints)
            best_e, best_hit = e, hit
        if hit == 1.0:
            break
    return best_e, best_hit


def enc_alp(values: pa.Array, opts: dict) -> tuple[dict, list[bytes]]:
    v = _prim_np(values)
    if v.dtype not in (np.float64, np.float32):
        raise CodecError("alp codec is float-only")
    f32 = v.dtype == np.float32
    n = len(v)
    if n == 0:
        return {"e": 0, "ref": 0, "width": 0, "nexc": 0}, [b"", b"", b""]
    w = v.astype(np.float64) if f32 else v
    e = opts["e"] if "e" in opts else alp_probe(v)[0]
    ints, exact = _alp_exact_ints(w, e)
    if f32:
        # exactness must hold in the STORED width: decode casts back to
        # float32, so compare there
        p = 10.0 ** e
        with np.errstate(invalid="ignore", over="ignore"):
            back32 = (ints / p).astype(np.float32)
        exact = exact & (back32.view(np.int32) == v.view(np.int32))
    exc_idx = np.flatnonzero(~exact)
    if len(exc_idx) > n * float(opts.get("max_exc", 0.2)):
        raise CodecError(f"alp exception rate {len(exc_idx)}/{n}")
    if len(exc_idx):
        # placeholder keeps exception slots from widening the pack
        fill = ints[exact][0] if exact.any() else 0
        ints[exc_idx] = fill
    ref = int(ints.min())
    with np.errstate(over="ignore"):
        d = _as_u64_wrapped(ints) - np.uint64(ref & 0xFFFFFFFFFFFFFFFF)
    width = bit_width(int(d.max()))
    return (
        {"e": e, "ref": ref, "width": width, "nexc": len(exc_idx)},
        [
            pack_bits(d, width),
            exc_idx.astype(np.uint32).tobytes(),
            v[exc_idx].tobytes(),
        ],
    )


def dec_alp(meta: dict, secs: list, n: int, dtype: pa.DataType) -> pa.Array:
    npdt = np.dtype(dtype.to_pandas_dtype())
    u = unpack_bits(secs[0], meta["width"], n)
    with np.errstate(over="ignore"):
        ints = (u + np.uint64(meta["ref"] & 0xFFFFFFFFFFFFFFFF)).view(np.int64)
    x = ints / (10.0 ** meta["e"])
    out = x.astype(npdt) if npdt != np.float64 else x
    if meta["nexc"]:
        pos = np.frombuffer(secs[1], dtype=np.uint32)
        out[pos] = np.frombuffer(secs[2], dtype=npdt)
    return pa.array(out, type=dtype)


# ---------------------------------------------------------------------------
# bit-pack / frame-of-reference / delta (integers)
# ---------------------------------------------------------------------------

def _as_u64_wrapped(v: np.ndarray) -> np.ndarray:
    """int -> uint64 with mod-2^64 semantics (safe for the FoR subtraction)."""
    return v.astype(np.int64, copy=False).view(np.uint64)


def enc_bitpack(values: pa.Array, opts: dict) -> tuple[dict, list[bytes]]:
    v = _prim_np(values)
    if len(v) == 0:
        return {"width": 0}, [b""]
    vi = v.astype(np.int64, copy=False)
    if vi.min() < 0:
        raise CodecError("bitpack requires non-negative values (use for/delta)")
    width = bit_width(int(vi.max()))
    return {"width": width}, [pack_bits(vi.view(np.uint64), width)]


def dec_bitpack(meta: dict, secs: list, n: int, dtype: pa.DataType) -> pa.Array:
    u = unpack_bits(secs[0], meta["width"], n)
    return pa.array(u.view(np.int64).astype(np.dtype(dtype.to_pandas_dtype()), copy=False), type=dtype)


def enc_for(values: pa.Array, opts: dict) -> tuple[dict, list[bytes]]:
    v = _prim_np(values)
    if len(v) == 0:
        return {"ref": 0, "width": 0}, [b""]
    vi = v.astype(np.int64, copy=False)
    ref = int(vi.min())
    with np.errstate(over="ignore"):
        d = _as_u64_wrapped(vi) - np.uint64(ref & 0xFFFFFFFFFFFFFFFF)
    width = bit_width(int(d.max()))
    return {"ref": ref, "width": width}, [pack_bits(d, width)]


def dec_for(meta: dict, secs: list, n: int, dtype: pa.DataType) -> pa.Array:
    u = unpack_bits(secs[0], meta["width"], n)
    with np.errstate(over="ignore"):
        v = (u + np.uint64(meta["ref"] & 0xFFFFFFFFFFFFFFFF)).view(np.int64)
    return pa.array(v.astype(np.dtype(dtype.to_pandas_dtype()), copy=False), type=dtype)


def enc_delta(values: pa.Array, opts: dict) -> tuple[dict, list[bytes]]:
    """Delta + frame-of-reference over the deltas; ideal for sorted ints."""
    v = _prim_np(values)
    if len(v) == 0:
        return {"first": 0, "ref": 0, "width": 0}, [b""]
    vi = v.astype(np.int64, copy=False)
    u = _as_u64_wrapped(vi)
    with np.errstate(over="ignore"):
        deltas = u[1:] - u[:-1]  # mod 2^64, consistent with decode cumsum
    if len(deltas) == 0:
        return {"first": int(vi[0]), "ref": 0, "width": 0}, [b""]
    # FoR over wrapped deltas: pick ref minimizing width in zigzag space
    z = ((deltas.view(np.int64) << 1) ^ (deltas.view(np.int64) >> 63)).view(np.uint64)
    ref = int(z.min())
    with np.errstate(over="ignore"):
        d = z - np.uint64(ref)
    width = bit_width(int(d.max()))
    return {"first": int(vi[0]), "ref": ref, "width": width}, [pack_bits(d, width)]


def dec_delta(meta: dict, secs: list, n: int, dtype: pa.DataType) -> pa.Array:
    npdt = np.dtype(dtype.to_pandas_dtype())
    if n == 0:
        return pa.array(np.empty(0, dtype=npdt), type=dtype)
    u = unpack_bits(secs[0], meta["width"], n - 1)
    with np.errstate(over="ignore"):
        z = u + np.uint64(meta["ref"])
        deltas = (((z >> np.uint64(1)).view(np.int64)) ^ -(z & np.uint64(1)).view(np.int64)).view(np.uint64)
        out = np.empty(n, dtype=np.uint64)
        out[0] = np.uint64(np.int64(meta["first"]))
        np.cumsum(deltas, out=out[1:])
        out[1:] += out[0]
    return pa.array(out.view(np.int64).astype(npdt, copy=False), type=dtype)


# ---------------------------------------------------------------------------
# RLE — manual run detection (type-agnostic, vectorized via pyarrow compute)
# ---------------------------------------------------------------------------

def enc_rle(values: pa.Array, opts: dict) -> tuple[dict, list[bytes]]:
    n = len(values)
    if n == 0:
        return {"runs": 0, "vcodec": "raw"}, [
            _enc_sub(pa.array(np.empty(0, np.int64)), "for"),
            _enc_sub(values.slice(0, 0), opts.get("vcodec", "auto")),
        ]
    neq = pc.not_equal(values.slice(1, n - 1), values.slice(0, n - 1))
    change = np.concatenate([[True], neq.to_numpy(zero_copy_only=False).astype(bool)])
    starts = np.flatnonzero(change)
    run_lengths = np.diff(np.append(starts, n)).astype(np.int64)
    run_values = values.take(pa.array(starts))
    return (
        {"runs": int(len(starts))},
        [
            _enc_sub(pa.array(run_lengths), "for"),
            _enc_sub(run_values, opts.get("vcodec", "auto")),
        ],
    )


def dec_rle(meta: dict, secs: list, n: int, dtype: pa.DataType) -> pa.Array:
    run_lengths = _dec_sub(secs[0]).to_numpy(zero_copy_only=False)
    run_values = _dec_sub(secs[1])
    if n == 0:
        return run_values.slice(0, 0)
    idx = np.repeat(np.arange(len(run_lengths), dtype=np.int64), run_lengths)
    return run_values.take(pa.array(idx))


# ---------------------------------------------------------------------------
# dictionary — hash symbol table via arrow's C++ dictionary_encode
# ---------------------------------------------------------------------------

def enc_dict(values: pa.Array, opts: dict) -> tuple[dict, list[bytes]]:
    de = values.dictionary_encode()
    codes = de.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dictionary = de.dictionary
    width = bit_width(max(len(dictionary) - 1, 0))
    return (
        {"width": width, "size": len(dictionary)},
        [
            pack_bits(codes.view(np.uint64), width),
            _enc_sub(dictionary, opts.get("vcodec", "auto")),
        ],
    )


def dec_dict(meta: dict, secs: list, n: int, dtype: pa.DataType) -> pa.Array:
    codes = unpack_bits(secs[0], meta["width"], n).view(np.int64)
    dictionary = _dec_sub(secs[1])
    return dictionary.take(pa.array(codes))


# ---------------------------------------------------------------------------
# prefix (front coding) — "RLE over sorted path prefixes"
# ---------------------------------------------------------------------------

_PREFIX_MAX_LEN = 4096
_PREFIX_MAX_CELLS = 1 << 27  # 128M cells ≈ 128MB uint8 matrix cap


def prefix_viable(n: int, max_len: int) -> bool:
    return max_len <= _PREFIX_MAX_LEN and n * max(max_len, 1) <= _PREFIX_MAX_CELLS


def enc_prefix(values: pa.Array, opts: dict) -> tuple[dict, list[bytes]]:
    lengths, data = string_parts(values)
    n = len(lengths)
    if n == 0:
        return {"suffix_comp": "none"}, [
            _enc_sub(pa.array(np.empty(0, np.int64)), "for"),
            _enc_sub(pa.array(np.empty(0, np.int64)), "for"),
            b"",
        ]
    max_len = int(lengths.max()) if n else 0
    if not prefix_viable(n, max_len):
        raise CodecError("prefix codec: strings too long for matrix kernel")
    total = int(lengths.sum())
    buf = np.frombuffer(data, dtype=np.uint8)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    row_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)
    col_idx = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], lengths)
    mat = np.zeros((n, max(max_len, 1)), dtype=np.uint8)
    mat[row_idx, col_idx] = buf
    # shared-prefix length with the previous row (vectorized cumulative AND)
    pl = np.zeros(n, dtype=np.int64)
    if n > 1 and max_len > 0:
        eq = np.logical_and.accumulate(mat[1:] == mat[:-1], axis=1)
        pl[1:] = np.minimum(eq.sum(axis=1), np.minimum(lengths[1:], lengths[:-1]))
    suffix_mask = col_idx >= np.repeat(pl, lengths)
    suffix = buf[suffix_mask].tobytes()
    suffix_lens = lengths - pl
    meta: dict = {"suffix_comp": "none"}
    if opts.get("suffix_comp", "zstd") == "zstd":
        meta = {"suffix_comp": "zstd", "rawsize": len(suffix)}
        suffix = _zstd(suffix, opts.get("level", _ZSTD_LEVEL))
    return meta, [
        _enc_sub(pa.array(pl), "for"),
        _enc_sub(pa.array(suffix_lens), "for"),
        suffix,
    ]


def dec_prefix(meta: dict, secs: list, n: int, dtype: pa.DataType) -> pa.Array:
    pl = _dec_sub(secs[0]).to_numpy(zero_copy_only=False)
    suffix_lens = _dec_sub(secs[1]).to_numpy(zero_copy_only=False)
    suffix = secs[2]
    if meta.get("suffix_comp") == "zstd":
        suffix = _unzstd(suffix, meta["rawsize"])
    if n == 0:
        return strings_from_parts(np.empty(0, np.int64), b"", dtype)
    lengths = pl + suffix_lens
    max_len = int(lengths.max()) if n else 0
    if max_len == 0:
        return strings_from_parts(lengths, b"", dtype)
    sbuf = np.frombuffer(suffix, dtype=np.uint8)
    total_s = int(suffix_lens.sum())
    s_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(suffix_lens, out=s_off[1:])
    row_s = np.repeat(np.arange(n, dtype=np.int64), suffix_lens)
    col_s = (
        np.arange(total_s, dtype=np.int64)
        - np.repeat(s_off[:-1], suffix_lens)
        + np.repeat(pl, suffix_lens)
    )
    mat = np.zeros((n, max_len), dtype=np.uint8)
    mat[row_s, col_s] = sbuf
    # ownership: cell (i,j) explicitly written iff pl[i] <= j < len[i];
    # otherwise inherit from the nearest earlier writer (forward fill).
    # int32 halves the accumulate's memory traffic (the single hottest
    # pass); owner stores row+1 so 0 means "no writer yet".
    idt = np.int32 if n < 2**31 - 1 else np.int64
    owner = np.zeros((n, max_len), dtype=idt)
    owner[row_s, col_s] = row_s + 1
    src = np.maximum.accumulate(owner, axis=0)
    np.subtract(src, 1, out=src)
    # cells with j < pl[i] have src >= 0 by the front-coding invariant
    np.maximum(src, 0, out=src)
    resolved = np.take_along_axis(mat, src, axis=0)
    out_mask = (np.arange(max_len)[None, :] < lengths[:, None]).ravel()
    out = resolved.ravel()[out_mask]
    return strings_from_parts(lengths, out, dtype)
