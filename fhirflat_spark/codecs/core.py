"""Chunk container, bit-packing primitives, and physical-type normalization.

Everything here is vectorized numpy / pyarrow — these kernels run inside
``mapInArrow`` batches on executors, so a Python-level loop over rows would
be the exact anti-pattern the reference suffers from (row-wise ``df.apply``,
reference ``fhirflat/ingest.py:36-38``).

Chunk wire format (one encoded column chunk)::

    b"FFSC" | u8 version | u32 header_len | header_json | section_0 | ...

``header_json`` = ``{"codec": str, "n": int, "dtype": str, "meta": {...},
"secs": [int, ...]}`` where ``secs`` holds each section's byte length.
Sub-chunks (e.g. an RLE codec's values stream) are themselves serialized
chunks stored as one section — codecs compose recursively.
"""

from __future__ import annotations

import json
import struct

import numpy as np
import pyarrow as pa

MAGIC = b"FFSC"
VERSION = 1


class CodecError(ValueError):
    pass


# ---------------------------------------------------------------------------
# chunk (de)serialization
# ---------------------------------------------------------------------------

def pack_chunk(codec: str, n: int, dtype: str, meta: dict, sections: list[bytes]) -> bytes:
    header = json.dumps(
        {"codec": codec, "n": n, "dtype": dtype, "meta": meta,
         "secs": [len(s) for s in sections]},
        separators=(",", ":"),
    ).encode()
    return b"".join(
        [MAGIC, struct.pack("<BI", VERSION, len(header)), header, *sections]
    )


def unpack_chunk(blob: bytes | memoryview) -> tuple[str, int, str, dict, list[memoryview]]:
    mv = memoryview(blob)
    if bytes(mv[:4]) != MAGIC:
        raise CodecError("bad chunk magic")
    version, hlen = struct.unpack("<BI", mv[4:9])
    if version != VERSION:
        raise CodecError(f"unsupported chunk version {version}")
    header = json.loads(bytes(mv[9 : 9 + hlen]))
    sections: list[memoryview] = []
    pos = 9 + hlen
    for slen in header["secs"]:
        sections.append(mv[pos : pos + slen])
        pos += slen
    return header["codec"], header["n"], header["dtype"], header["meta"], sections


# ---------------------------------------------------------------------------
# bit packing (the shared primitive under dict codes, FoR, delta, run lengths)
# ---------------------------------------------------------------------------

def bit_width(max_value: int) -> int:
    """Bits needed for values in [0, max_value]."""
    if max_value < 0:
        raise CodecError("bit_width expects non-negative")
    return int(max_value).bit_length()


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative integers into a dense ``width``-bit big-endian stream.

    Vectorized: bytes -> unpackbits -> column slice -> packbits. No Python
    loop; peak temp memory is 64 bits/value of uint8 which is fine at the
    ~10^4-row Arrow-batch granularity we encode at.
    """
    if width < 0 or width > 64:
        raise CodecError(f"bad bit width {width}")
    if width == 0 or len(values) == 0:
        return b""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    bits = np.unpackbits(v.view(np.uint8).reshape(-1, 8)[:, ::-1], axis=1)
    return np.packbits(bits[:, 64 - width :].ravel()).tobytes()


def unpack_bits(data: bytes | memoryview, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack_bits`; returns uint64 of length ``n``."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8), count=n * width)
    full = np.zeros((n, 64), dtype=np.uint8)
    full[:, 64 - width :] = bits.reshape(n, width)
    return np.packbits(full, axis=1)[:, ::-1].copy().view(np.uint64).ravel()


def zigzag_encode(v: np.ndarray) -> np.ndarray:
    """Signed int64 -> uint64 so small-magnitude values bit-pack small."""
    v = v.astype(np.int64, copy=False)
    return ((v << 1) ^ (v >> 63)).view(np.uint64)


def zigzag_decode(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64, copy=False)
    return ((u >> np.uint64(1)).view(np.int64)) ^ -(u & np.uint64(1)).view(np.int64)


# ---------------------------------------------------------------------------
# physical type normalization
# ---------------------------------------------------------------------------
# Codecs only ever see: string/large_string/binary/large_binary arrays, or
# integer/float/uint8 numpy-backed primitive arrays. Logical types
# (timestamp, date, bool, float) round-trip through a physical view plus a
# dtype token recorded in the chunk header — mirroring how the reference
# serializes datetimes to ISO strings for parquet stability
# (reference fhirflat/util.py:150-172), but losslessly.

_PHYS_TOKENS: dict[str, pa.DataType] = {
    "string": pa.string(),
    "large_string": pa.large_string(),
    "binary": pa.binary(),
    "large_binary": pa.large_binary(),
    "int64": pa.int64(),
    "int32": pa.int32(),
    "int16": pa.int16(),
    "int8": pa.int8(),
    "uint64": pa.uint64(),
    "uint32": pa.uint32(),
    "uint8": pa.uint8(),
    "float64": pa.float64(),
    "float32": pa.float32(),
    # arrow's str() names for floats
    "double": pa.float64(),
    "float": pa.float32(),
    "uint16": pa.uint16(),
}


def dtype_token(t: pa.DataType) -> str:
    return str(t)


def type_from_token(token: str) -> pa.DataType:
    if token in _PHYS_TOKENS:
        return _PHYS_TOKENS[token]
    if token == "bool":
        return pa.bool_()
    if token == "date32[day]":
        return pa.date32()
    if token.startswith("timestamp"):
        # "timestamp[us]" or "timestamp[us, tz=UTC]"
        inner = token[token.index("[") + 1 : token.rindex("]")]
        parts = [p.strip() for p in inner.split(",")]
        unit = parts[0]
        tz = None
        for p in parts[1:]:
            if p.startswith("tz="):
                tz = p[3:]
        return pa.timestamp(unit, tz=tz)
    raise CodecError(f"unknown dtype token {token!r}")


def to_physical(arr: pa.Array) -> pa.Array:
    """View logical arrays as their physical storage (lossless)."""
    t = arr.type
    if pa.types.is_timestamp(t):
        return arr.cast(pa.int64())
    if pa.types.is_date32(t):
        return arr.cast(pa.int32())
    if pa.types.is_boolean(t):
        return arr.cast(pa.uint8())
    return arr


def from_physical(arr: pa.Array, token: str) -> pa.Array:
    target = type_from_token(token)
    if arr.type.equals(target):
        return arr
    return arr.cast(target)


# ---------------------------------------------------------------------------
# string-array buffer access (vectorized, slice-safe)
# ---------------------------------------------------------------------------

def string_parts(arr: pa.Array) -> tuple[np.ndarray, bytes]:
    """(lengths int64, concatenated value bytes) of a no-null string/binary array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    off_dtype = np.int64 if (pa.types.is_large_string(t) or pa.types.is_large_binary(t)) else np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype, count=len(arr) + 1, offset=arr.offset * np.dtype(off_dtype).itemsize)
    data = bytes(memoryview(bufs[2])[offsets[0] : offsets[-1]]) if bufs[2] is not None else b""
    lengths = np.diff(offsets).astype(np.int64)
    return lengths, data


def strings_from_parts(lengths: np.ndarray, data, dtype: pa.DataType) -> pa.Array:
    """Rebuild a string/binary array from lengths + concatenated bytes.

    ``data`` may be bytes, memoryview, or a uint8 ndarray — py_buffer
    wraps any buffer-protocol object ZERO-COPY and holds a reference, so
    no ``bytes()`` materialization (it doubled decode's allocation
    traffic on multi-MB string chunks). Callers must not mutate ``data``
    after the call."""
    n = len(lengths)
    large = pa.types.is_large_string(dtype) or pa.types.is_large_binary(dtype)
    off_dtype = np.int64 if large else np.int32
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    if not large and offsets[-1] > np.iinfo(np.int32).max:
        raise CodecError("chunk too large for 32-bit string offsets")
    off_buf = pa.py_buffer(offsets.astype(off_dtype, copy=False))
    data_buf = pa.py_buffer(data)
    return pa.Array.from_buffers(dtype, n, [None, off_buf, data_buf])
