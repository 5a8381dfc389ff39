"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed by Arrow-batched pandas kernels via ``mapInPandas``.

The image/audio libraries aren't in this container, so the *decode* step
here is a deterministic stand-in (sha256-derived pseudo-dimensions), clearly
marked where a real decoder (PIL/libsndfile/ffmpeg) would plug in. The
Spark-side plumbing — binary schema, batch iteration, UDF signature,
partition behavior — is real and oracle-checked (the stand-in features
are reproducible in SQL from the same sha256).

For PNG and PCM16-WAV payloads the decode is REAL with no external deps:
``operators/media.py`` ships pure zlib+numpy / stdlib-``wave`` codecs and
the ``image_decode_real`` / ``audio_decode_real`` oracle queries. This
module remains the generic plumbing + the env-gated PIL path for formats
that do need external decoders (JPEG, MP4, ...).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fhirflat_spark.operators.relational import load

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("checksum", T.StringType(), False),
        T.StructField("pseudo_width", T.IntegerType(), False),
        T.StructField("pseudo_height", T.IntegerType(), False),
    ]
)


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Vectorized per-batch feature extraction over binary payloads.

    REAL DECODER GOES HERE: e.g. ``PIL.Image.open(io.BytesIO(payload))``
    per element via a vectorized decode library. Stand-in: dimensions
    derived from the payload's sha256 so the pipeline stays deterministic
    and oracle-checkable without image libs.
    """
    import hashlib

    for pdf in batches:
        payloads = pdf["payload"]
        shas = payloads.map(lambda b: hashlib.sha256(b).hexdigest())  # C-speed hashlib per element
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int32"),
                "checksum": shas,
                "pseudo_width": (shas.str.slice(0, 4).apply(int, base=16) % 1920).astype("int32"),
                "pseudo_height": (shas.str.slice(4, 8).apply(int, base=16) % 1080).astype("int32"),
            }
        )


try:  # real image decoding when the environment has it
    from PIL import Image as _PILImage

    HAVE_PIL = True
except ImportError:  # this container: stand-in only
    _PILImage = None
    HAVE_PIL = False


IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mode", T.StringType(), True),
    ]
)


def _decode_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL decoder kernel (used when PIL is installed): same batch
    shape, schema discipline, and failure contract as the stand-in —
    undecodable payloads yield typed nulls instead of failing the task
    (corrupt files are data, not errors, at corpus scale)."""
    import io

    def one(b):
        try:
            with _PILImage.open(io.BytesIO(b)) as im:
                return im.width, im.height, im.mode
        except Exception:
            return None, None, None

    for pdf in batches:
        dims = [one(b) for b in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "width": pd.array([d[0] for d in dims], dtype="Int32"),
                "height": pd.array([d[1] for d in dims], dtype="Int32"),
                "mode": [d[2] for d in dims],
            }
        )


def image_features(df, id_col: str = "doc_id", payload_col: str = "payload"):
    """Decode image dimensions/mode from a binary column — the REAL
    multimodal path, available whenever PIL is importable on the
    executors. This container ships no image libs, so calling it here
    raises; the plumbing (schema, Arrow batching, null contract) is the
    tested stand-in's, and the kernel swaps in transparently when the
    environment provides the decoder."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decoding needs PIL on the executors (not in this "
            "container); the deterministic stand-in kernel "
            "(_extract_features) covers the Spark-side plumbing"
        )
    sel = df.select(F.col(id_col).alias("doc_id"),
                    F.col(payload_col).alias("payload"))
    return sel.mapInPandas(_decode_image_batch, schema=IMAGE_SCHEMA)


def q_multimodal_features(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    binary = docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),  # opaque binary stand-in
    )
    # partition-friendly: mapInPandas keeps batches Arrow-sized; at scale the
    # binary column would come from an object-store-backed source table
    return binary.mapInPandas(_extract_features, schema=FEATURE_SCHEMA).orderBy("doc_id")


SQL_MULTIMODAL_FEATURES = """
SELECT doc_id,
       CAST(strlen(text) AS INTEGER) AS n_bytes,
       sha256(text) AS checksum,
       CAST(('0x' || substr(sha256(text), 1, 4))::BIGINT % 1920 AS INTEGER) AS pseudo_width,
       CAST(('0x' || substr(sha256(text), 5, 4))::BIGINT % 1080 AS INTEGER) AS pseudo_height
FROM documents ORDER BY doc_id
"""


def q_frame_sample_plumbing(spark, sf_dir):
    """Frame-sampling plumbing: one row per sampled 'frame' index — the
    explode/posexplode shape a video pipeline uses; frame count derived
    deterministically from payload size (stand-in for container parsing)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            (F.length("text") / 100).cast("int").alias("n_frames"),
        )
        .select(
            "doc_id",
            "n_frames",
            F.posexplode(F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)))).alias(
                "pos", "frame_idx"
            ),
        )
        .where(F.col("n_frames") > 0)
        .select("doc_id", "frame_idx")
        .orderBy("doc_id", "frame_idx")
    )


SQL_FRAME_SAMPLE = """
SELECT doc_id, unnest(range(length(text) // 100)) AS frame_idx
FROM documents
WHERE length(text) // 100 > 0
ORDER BY doc_id, frame_idx
"""


QUERIES = {
    "multimodal_features": (q_multimodal_features, SQL_MULTIMODAL_FEATURES),
    "frame_sample_plumbing": (q_frame_sample_plumbing, SQL_FRAME_SAMPLE),
}
