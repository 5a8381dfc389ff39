"""Real multimodal decoders (operators/media.py): pure-stdlib PNG + WAV.

Pixel/sample-exact round-trips on random data (the full-strength check the
driver's closed-form oracle cannot express), every PNG scanline filter,
palette decode, the corrupt-payload null contract, and the Spark kernel's
typed-null behavior.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from fhirflat_spark.operators.media import (
    _PNG_SIG,
    _chunk,
    _synth_audio,
    _synth_image,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
    image_decode_features,
    resize_nearest,
)

rng = np.random.default_rng(20260819)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_random(channels, filter_type):
    img = rng.integers(0, 256, size=(13, 17, channels), dtype=np.uint8)
    out = decode_png(encode_png(img, filter_type=filter_type))
    assert out is not None and out.shape == img.shape
    np.testing.assert_array_equal(out, img)


def test_png_roundtrip_2d_and_extreme_dims():
    g = rng.integers(0, 256, size=(1, 257), dtype=np.uint8)  # single row, wide
    np.testing.assert_array_equal(decode_png(encode_png(g, filter_type=4))[:, :, 0], g)
    tall = rng.integers(0, 256, size=(257, 1, 3), dtype=np.uint8)  # single col
    np.testing.assert_array_equal(decode_png(encode_png(tall, filter_type=3)), tall)


def test_png_palette_decode():
    # hand-built color-type-3 PNG: 2x2 indices into a 4-entry palette
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + row.tobytes() for row in idx)
    blob = (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", palette.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(blob)
    np.testing.assert_array_equal(out, palette[idx])


def test_png_null_contract():
    assert decode_png(b"definitely not a png") is None
    blob = encode_png(rng.integers(0, 256, size=(4, 4), dtype=np.uint8))
    assert decode_png(blob[:20]) is None  # truncated mid-IHDR
    assert decode_png(blob[:-8]) is None or decode_png(blob[:-8]) is not None  # no crash
    # 16-bit depth / interlaced are unsupported -> None, not garbage
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    assert decode_png(_PNG_SIG + _chunk(b"IHDR", ihdr16) + _chunk(b"IEND", b"")) is None
    ihdr_i = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    assert decode_png(_PNG_SIG + _chunk(b"IHDR", ihdr_i) + _chunk(b"IEND", b"")) is None
    # IDAT whose decompressed size disagrees with the header -> None
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    bad = _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(b"\x00ab")) + _chunk(b"IEND", b"")
    assert decode_png(bad) is None


def test_resize_nearest_known_grid():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    up = resize_nearest(img, 8, 8)
    assert up.shape == (8, 8, 1)
    # each source pixel becomes a 2x2 block under the centered NN grid
    np.testing.assert_array_equal(up[::2, ::2], img)
    np.testing.assert_array_equal(up[1::2, 1::2], img)
    same = resize_nearest(img, 4, 4)
    np.testing.assert_array_equal(same, img)


@pytest.mark.parametrize("channels", [1, 2])
def test_wav_roundtrip_random(channels):
    s = rng.integers(-32768, 32768, size=(50, channels)).astype(np.int16)
    rate, ch, arr = decode_wav(encode_wav(s, 22050))
    assert rate == 22050 and ch == channels
    np.testing.assert_array_equal(arr, s)


def test_wav_null_contract():
    assert decode_wav(b"RIFFgarbage") is None
    assert decode_wav(b"") is None


def test_synth_payloads_match_closed_forms():
    for d in (0, 1, 2, 3, 4, 17, 255, 256, 4999):
        img = decode_png(_synth_image(d))
        h, w, c = img.shape
        assert (w, h, c) == (8 + d % 9, 8 + d % 7, 3 if d % 2 == 0 else 1)
        assert float(img.mean()) == float(d % 256)
        blob = _synth_audio(d)
        assert len(blob) == 44 + (64 + d % 100) * 2 * (1 + d % 2)
        rate, ch, arr = decode_wav(blob)
        assert (rate, ch, arr.shape[0]) == (16000, 1 + d % 2, 64 + d % 100)


def test_spark_kernel_typed_nulls(spark):
    """Corrupt payloads are data, not task failures: the feature kernel
    yields typed nulls for them and real features for their neighbors."""
    good = encode_png(np.full((3, 5, 3), 9, dtype=np.uint8))
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"corrupt bytes"))],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in image_decode_features(df).collect()}
    assert rows[1]["width"] == 5 and rows[1]["height"] == 3 and rows[1]["channels"] == 3
    assert rows[1]["mean_value"] == 9.0
    assert rows[2]["width"] is None and rows[2]["mean_value"] is None
