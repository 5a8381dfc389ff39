"""Codec registry + the public ``encode_array`` / ``decode_array`` API.

``encode_array(arr, codec)`` serializes one column chunk to bytes;
``decode_array(blob)`` reconstructs the exact arrow array (type-, null-,
and bit-identical). ``codec="auto"`` delegates to the stats-driven
selector (fhirflat_spark/selector.py).

Nulls are handled once, here: the validity bitmap is packed with
``np.packbits`` and the codec only ever sees the null-free values —
decode scatters them back via a masked ``take``. This mirrors the
reference's split of valid rows from error rows into separate channels
(reference fhirflat/resources/base.py:136-149) at the cell level.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from fhirflat_spark.codecs import fsst, kernels
from fhirflat_spark.codecs.core import (
    CodecError,
    dtype_token,
    from_physical,
    pack_chunk,
    to_physical,
    type_from_token,
    unpack_chunk,
)

CODECS = {
    "arrowz": (kernels.enc_arrowz, kernels.dec_arrowz),
    "constant": (kernels.enc_constant, kernels.dec_constant),
    "raw": (kernels.enc_raw, kernels.dec_raw),
    "zstd": (kernels.enc_zstd, kernels.dec_zstd),
    "bss": (kernels.enc_bss, kernels.dec_bss),
    "alp": (kernels.enc_alp, kernels.dec_alp),
    "bitpack": (kernels.enc_bitpack, kernels.dec_bitpack),
    "for": (kernels.enc_for, kernels.dec_for),
    "delta": (kernels.enc_delta, kernels.dec_delta),
    "rle": (kernels.enc_rle, kernels.dec_rle),
    "dict": (kernels.enc_dict, kernels.dec_dict),
    "prefix": (kernels.enc_prefix, kernels.dec_prefix),
    "fsst": (fsst.enc_fsst, fsst.dec_fsst),
}

# physical arrow types the specialized codecs understand; anything else
# (nested structs/lists, decimals, ...) goes through the universal arrow
# IPC + zstd fallback so every type round-trips bit-identically.
_SPECIALIZED = (
    pa.types.is_string,
    pa.types.is_large_string,
    pa.types.is_binary,
    pa.types.is_large_binary,
    pa.types.is_integer,
    pa.types.is_floating,
)


def _is_specialized(t: pa.DataType) -> bool:
    return any(p(t) for p in _SPECIALIZED)


def _is_list_type(t: pa.DataType) -> bool:
    return (
        pa.types.is_list(t)
        or pa.types.is_large_list(t)
        or pa.types.is_fixed_size_list(t)
    )


def encode_array(
    arr: pa.Array | pa.ChunkedArray,
    codec: str = "auto",
    opts: dict | None = None,
    depth: int = 0,
) -> bytes:
    opts = opts or {}
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    logical_token = dtype_token(arr.type)

    if arr.null_count > 0:
        valid = ~arr.is_null().to_numpy(zero_copy_only=False).astype(bool)
        bitmap = np.packbits(valid)
        inner = encode_array(arr.drop_null(), codec=codec, opts=opts, depth=depth)
        return pack_chunk(
            "nullable", n, logical_token, {"valid": int(valid.sum())},
            [bitmap.tobytes(), inner],
        )

    if _is_list_type(arr.type):
        # Specialized list codec: split into a lengths stream and a
        # flattened values stream, each recursively encoded — so an
        # embedding column (array<float>) gets the float codecs (bss /
        # alp) on its values and a constant/RLE lengths stream, instead
        # of the opaque IPC fallback. Nested lists and element nulls
        # compose for free through the recursion (the nullable wrapper
        # and this branch re-apply at each level).
        import pyarrow.compute as pc

        child = arr.type.value_field
        vals = arr.flatten()
        meta = {"field": child.name, "item_nullable": child.nullable}
        if pa.types.is_fixed_size_list(arr.type):
            meta["kind"] = "fixed"
            meta["dim"] = arr.type.list_size
            sections_in = []
        else:
            meta["kind"] = (
                "large_list" if pa.types.is_large_list(arr.type) else "list"
            )
            lengths = pc.list_value_length(arr).cast(pa.int32())
            sections_in = [
                encode_array(lengths, codec="auto", depth=depth + 1)
            ]
        val_codec = codec if len(vals) else "arrowz"
        sections_in.append(
            encode_array(vals, codec=val_codec, opts=opts, depth=depth + 1)
        )
        return pack_chunk("list", n, logical_token, meta, sections_in)

    phys = to_physical(arr)
    if not _is_specialized(phys.type):
        codec = "arrowz"
    if codec == "auto":
        from fhirflat_spark.selector import choose_codec

        codec, opts = choose_codec(phys, depth=depth, opts=opts)
    enc, _ = CODECS[codec]
    try:
        meta, sections = enc(phys, opts)
    except CodecError:
        if codec == "arrowz" or opts.get("strict"):
            raise
        codec = "arrowz"
        meta, sections = kernels.enc_arrowz(phys, opts)
    return pack_chunk(codec, n, logical_token, meta, sections)


def decode_array(blob: bytes | memoryview) -> pa.Array:
    codec, n, token, meta, sections = unpack_chunk(blob)
    if codec == "nullable":
        valid = np.unpackbits(
            np.frombuffer(sections[0], dtype=np.uint8), count=n
        ).astype(bool)
        values = decode_array(sections[1])
        take_idx = np.full(n, -1, dtype=np.int64)
        take_idx[np.flatnonzero(valid)] = np.arange(meta["valid"], dtype=np.int64)
        idx = pa.array(take_idx, mask=~valid)
        return values.take(idx)
    if codec == "list":
        values = decode_array(sections[-1])
        field = pa.field(
            meta["field"], values.type, nullable=meta["item_nullable"]
        )
        if meta["kind"] == "fixed":
            built = pa.FixedSizeListArray.from_arrays(values, meta["dim"])
            return built.cast(pa.list_(field, meta["dim"]))
        lengths = decode_array(sections[0]).to_numpy(zero_copy_only=False)
        if meta["kind"] == "large_list":
            offsets = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lengths, out=offsets[1:])
            built = pa.LargeListArray.from_arrays(pa.array(offsets), values)
            return built.cast(pa.large_list(field))
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(lengths, out=offsets[1:])
        built = pa.ListArray.from_arrays(pa.array(offsets), values)
        return built.cast(pa.list_(field))
    _, dec = CODECS[codec]
    if codec == "arrowz":
        # IPC preserves the logical type exactly (incl. nested types whose
        # token we never need to parse back)
        return dec(meta, sections, n, None)
    target = type_from_token(token)
    phys_target = to_physical(pa.array([], type=target)).type
    out = dec(meta, sections, n, phys_target)
    return from_physical(out, token)


def encoded_size(blob: bytes) -> int:
    return len(blob)
