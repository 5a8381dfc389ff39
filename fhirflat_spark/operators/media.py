"""REAL multimodal decoders — pure-stdlib PNG and WAV codecs + Arrow-batched
Spark feature kernels.

``multimodal.py`` ships the generic binary-column plumbing with a
sha-derived stand-in where PIL/libsndfile would plug in (this container has
neither). This module closes that gap for the two formats that need nothing
beyond the standard library: PNG is ``zlib`` + numpy scanline unfiltering,
WAV is the stdlib ``wave`` module + ``numpy.frombuffer``. The decode step
here is *real* — bytes in, pixel/sample arrays out, bit-identical round-trip
pinned in ``tests/test_media.py`` — so an image/audio dedup or
feature-extraction pipeline runs end-to-end on these formats with no
external dependency. JPEG/MP4 etc. still route to the stand-in kernel.

Oracle strategy: the driver's DuckDB oracle cannot decode PNG bytes, so the
oracle-checked queries synthesize payloads *deterministically from doc_id*
(dimensions, channel count, constant fill, and even the PNG filter type are
closed-form functions of doc_id). The Spark side encodes → really decodes →
emits measured features; the SQL side recomputes the same features from the
closed forms. Any decoder defect (wrong unfilter math, wrong stride, wrong
channel handling) breaks the hash match. Pixel-exact round-trips on *random*
data are pinned in pytest where full-strength comparison is possible.

No reference analog (globaldothealth/fhirflat is text-only); this implements
the driver brief's multimodal requirement.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fhirflat_spark.operators.relational import load

# ---------------------------------------------------------------------------
# PNG codec (8-bit depth; gray / gray+alpha / RGB / RGBA / palette; no
# interlacing). Pure zlib + numpy.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# channels -> PNG color type (8-bit)
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> channels (3 = palette index)


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _filter_rows(img: np.ndarray, filter_type: int) -> bytes:
    """Apply one PNG scanline filter to every row (encode side).

    The filter byte prefixes each scanline; predictions use the RECON
    (original) pixels, so every filter is a pure vector op here.
    """
    h, w, c = img.shape
    x = img.astype(np.int16)
    left = np.zeros_like(x)
    left[:, 1:, :] = x[:, :-1, :]
    up = np.zeros_like(x)
    up[1:, :, :] = x[:-1, :, :]
    upleft = np.zeros_like(x)
    upleft[1:, 1:, :] = x[:-1, :-1, :]
    if filter_type == 0:
        raw = x
    elif filter_type == 1:  # sub
        raw = x - left
    elif filter_type == 2:  # up
        raw = x - up
    elif filter_type == 3:  # average
        raw = x - (left + up) // 2
    elif filter_type == 4:  # paeth
        p = left + up - upleft
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft))
        raw = x - pred
    else:
        raise ValueError(f"unknown PNG filter {filter_type}")
    raw = (raw % 256).astype(np.uint8).reshape(h, w * c)
    ftype = np.full((h, 1), filter_type, dtype=np.uint8)
    return np.concatenate([ftype, raw], axis=1).tobytes()


def encode_png(img: np.ndarray, filter_type: int = 0, level: int = 6) -> bytes:
    """Encode a uint8 array (h,w) or (h,w,c), c in {1,2,3,4}, as a PNG.

    ``filter_type`` applies that scanline filter to every row — used by the
    tests to exercise every unfilter path in :func:`decode_png`.
    """
    if img.ndim == 2:
        img = img[:, :, None]
    if img.dtype != np.uint8:
        raise ValueError("encode_png expects uint8")
    h, w, c = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    idat = zlib.compress(_filter_rows(img, filter_type), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering. raw is (h, 1+stride) uint8 rows
    (filter byte + filtered data); returns (h, stride) recon bytes.

    Filters none/sub/up are fully vectorized (sub is a per-channel
    cumulative sum); average/paeth need the left RECON neighbour so they
    run a per-pixel loop vectorized across channels — fine for the metadata
    scale these kernels see, and sequential by spec (each pixel depends on
    the previous one).
    """
    recon = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    npx = stride // bpp
    for r in range(h):
        f = int(raw[r, 0])
        line = raw[r, 1:]
        if f == 0:
            rec = line.copy()
        elif f == 1:  # sub: cumulative sum per channel position
            rec = (np.cumsum(line.reshape(npx, bpp).astype(np.int64), axis=0) % 256).astype(
                np.uint8
            ).reshape(stride)
        elif f == 2:  # up
            rec = line + prev  # uint8 wrap-around is the mod-256 add
        elif f == 3:  # average
            rec = np.empty(stride, dtype=np.uint8)
            px = line.reshape(npx, bpp).astype(np.int16)
            pv = prev.reshape(npx, bpp).astype(np.int16)
            left = np.zeros(bpp, dtype=np.int16)
            for i in range(npx):
                left = (px[i] + (left + pv[i]) // 2) % 256
                rec[i * bpp : (i + 1) * bpp] = left.astype(np.uint8)
        elif f == 4:  # paeth
            rec = np.empty(stride, dtype=np.uint8)
            px = line.reshape(npx, bpp).astype(np.int16)
            pv = prev.reshape(npx, bpp).astype(np.int16)
            left = np.zeros(bpp, dtype=np.int16)
            upleft = np.zeros(bpp, dtype=np.int16)
            for i in range(npx):
                p = left + pv[i] - upleft
                pa, pb, pc = np.abs(p - left), np.abs(p - pv[i]), np.abs(p - upleft)
                pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, pv[i], upleft))
                left = (px[i] + pred) % 256
                rec[i * bpp : (i + 1) * bpp] = left.astype(np.uint8)
                upleft = pv[i]
        else:
            raise ValueError(f"unknown PNG filter {f}")
        recon[r] = rec
        prev = rec
    return recon


def decode_png(data: bytes) -> np.ndarray | None:
    """Decode a PNG to a uint8 (h, w, channels) array; None if undecodable.

    Supports bit depth 8, color types 0/2/3/4/6, interlace 0 — the common
    web/PIL output shapes. Corrupt or unsupported payloads return None
    (corrupt files are data, not errors, at corpus scale).
    """
    try:
        if not data.startswith(_PNG_SIG):
            return None
        pos = len(_PNG_SIG)
        idat = []
        width = height = color_type = None
        palette = None
        while pos + 8 <= len(data):
            (length,) = struct.unpack_from(">I", data, pos)
            tag = data[pos + 4 : pos + 8]
            body = data[pos + 8 : pos + 8 + length]
            if len(body) != length:
                return None
            if tag == b"IHDR":
                width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                    ">IIBBBBB", body
                )
                if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
                    return None
                if color_type not in _CHANNELS:
                    return None
            elif tag == b"PLTE":
                palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
            elif tag == b"IDAT":
                idat.append(body)
            elif tag == b"IEND":
                break
            pos += 12 + length
        if width is None or not idat:
            return None
        bpp = _CHANNELS[color_type]
        stride = width * bpp
        raw = zlib.decompress(b"".join(idat))
        if len(raw) != height * (stride + 1):
            return None
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
        recon = _unfilter(rows, height, stride, bpp)
        img = recon.reshape(height, width, bpp)
        if color_type == 3:  # palette -> RGB
            if palette is None:
                return None
            img = palette[img[:, :, 0]]
        return img
    except Exception:
        return None


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbour resize, pure index math (the classic sampling grid:
    src = (dst + 0.5) * scale floored)."""
    h, w = img.shape[:2]
    rows = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    return img[rows][:, cols]


# ---------------------------------------------------------------------------
# WAV codec (PCM16) — stdlib ``wave`` + numpy.
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Encode int16 samples (n,) mono or (n, channels) as a PCM16 WAV."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes):
    """Decode a PCM16 WAV -> (rate, channels, int16 array (n, channels));
    None if undecodable."""
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            if w.getsampwidth() != 2:
                return None
            rate = w.getframerate()
            ch = w.getnchannels()
            n = w.getnframes()
            frames = w.readframes(n)
        arr = np.frombuffer(frames, dtype=np.int16).reshape(-1, ch)
        return rate, ch, arr
    except Exception:
        return None


# ---------------------------------------------------------------------------
# Deterministic payload synthesis (closed-form in doc_id, mirrored in SQL).
# ---------------------------------------------------------------------------

_AUDIO_RATE = 16000


def _synth_image(doc_id: int) -> bytes:
    w = 8 + doc_id % 9
    h = 8 + doc_id % 7
    c = 3 if doc_id % 2 == 0 else 1
    fill = doc_id % 256
    img = np.full((h, w, c), fill, dtype=np.uint8)
    return encode_png(img, filter_type=doc_id % 5)  # rotate through every filter


def _synth_audio(doc_id: int) -> bytes:
    n = 64 + doc_id % 100
    ch = 1 + doc_id % 2
    val = doc_id % 32768 - 16384
    samples = np.full((n, ch), val, dtype=np.int16)
    return encode_wav(samples, _AUDIO_RATE)


# ---------------------------------------------------------------------------
# Spark kernels (mapInPandas; binary columns cross the Arrow boundary).
# ---------------------------------------------------------------------------

_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("n_pixels", T.IntegerType(), True),
        T.StructField("mean_value", T.DoubleType(), True),
        T.StructField("resized_mean", T.DoubleType(), True),
    ]
)

AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("peak", T.IntegerType(), True),
    ]
)


def _synth_image_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "payload": [_synth_image(int(d)) for d in pdf["doc_id"]]}
        )


def _synth_audio_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "payload": [_synth_audio(int(d)) for d in pdf["doc_id"]]}
        )


def _image_feature_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL decode: PNG bytes -> pixels -> measured features. Undecodable
    payloads yield typed nulls (null contract shared with multimodal.py)."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            img = decode_png(bytes(payload))
            if img is None:
                rows.append((doc_id, None, None, None, None, None, None))
            else:
                h, w, c = img.shape
                small = resize_nearest(img, 16, 16)
                rows.append(
                    (doc_id, w, h, c, w * h, float(img.mean()), float(small.mean()))
                )
        out = pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURE_SCHEMA.fields])
        for col in ("width", "height", "channels", "n_pixels"):
            out[col] = out[col].astype("Int32")
        for col in ("mean_value", "resized_mean"):
            out[col] = out[col].astype("Float64")
        yield out


def _audio_feature_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            data = bytes(payload)
            dec = decode_wav(data)
            if dec is None:
                rows.append((doc_id, None, None, None, None, None, None))
            else:
                rate, ch, arr = dec
                n = arr.shape[0]
                rows.append(
                    (
                        doc_id,
                        len(data),
                        rate,
                        ch,
                        n,
                        n * 1000 // rate,
                        int(np.abs(arr.astype(np.int32)).max()) if n else 0,
                    )
                )
        out = pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURE_SCHEMA.fields])
        for col in ("n_bytes", "sample_rate", "n_channels", "n_samples", "duration_ms", "peak"):
            out[col] = out[col].astype("Int32")
        yield out


def image_decode_features(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Real PNG decode + feature extraction over a binary column."""
    sel = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return sel.mapInPandas(_image_feature_kernel, schema=IMAGE_FEATURE_SCHEMA)


def audio_decode_features(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Real WAV decode + feature extraction over a binary column."""
    sel = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return sel.mapInPandas(_audio_feature_kernel, schema=AUDIO_FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Oracle-checked queries. Payloads are synthesized closed-form from doc_id
# (one mapInPandas), then REALLY decoded (a second mapInPandas — the binary
# column crosses the Arrow boundary between them, like a source table would);
# the SQL twin recomputes every feature from the closed forms, so a decoder
# defect breaks the hash.
# ---------------------------------------------------------------------------


def q_image_decode_real(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(_synth_image_kernel, schema=_PAYLOAD_SCHEMA)
    return image_decode_features(payloads).orderBy("doc_id")


SQL_IMAGE_DECODE_REAL = """
SELECT doc_id,
       CAST(8 + doc_id % 9 AS INTEGER) AS width,
       CAST(8 + doc_id % 7 AS INTEGER) AS height,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS INTEGER) AS channels,
       CAST((8 + doc_id % 9) * (8 + doc_id % 7) AS INTEGER) AS n_pixels,
       CAST(doc_id % 256 AS DOUBLE) AS mean_value,
       CAST(doc_id % 256 AS DOUBLE) AS resized_mean
FROM documents ORDER BY doc_id
"""


def q_audio_decode_real(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id")
    payloads = docs.mapInPandas(_synth_audio_kernel, schema=_PAYLOAD_SCHEMA)
    return audio_decode_features(payloads).orderBy("doc_id")


SQL_AUDIO_DECODE_REAL = """
SELECT doc_id,
       CAST(44 + (64 + doc_id % 100) * 2 * (1 + doc_id % 2) AS INTEGER) AS n_bytes,
       CAST(16000 AS INTEGER) AS sample_rate,
       CAST(1 + doc_id % 2 AS INTEGER) AS n_channels,
       CAST(64 + doc_id % 100 AS INTEGER) AS n_samples,
       CAST((64 + doc_id % 100) * 1000 // 16000 AS INTEGER) AS duration_ms,
       CAST(abs(doc_id % 32768 - 16384) AS INTEGER) AS peak
FROM documents ORDER BY doc_id
"""


QUERIES = {
    "image_decode_real": (q_image_decode_real, SQL_IMAGE_DECODE_REAL),
    "audio_decode_real": (q_audio_decode_real, SQL_AUDIO_DECODE_REAL),
}
