"""Multimodal plumbing (operators/multimodal.py): the env-gated real
decoder path and the stand-in kernel's batch contract."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fhirflat_spark.operators import multimodal as mm


def test_standin_kernel_batch_contract():
    # driver-side kernel check: schema, dtypes, determinism
    pdf = pd.DataFrame(
        {"doc_id": [1, 2], "payload": [b"abc", b"\x00" * 10]}
    )
    out = pd.concat(mm._extract_features(iter([pdf])))
    assert list(out.columns) == [
        "doc_id", "n_bytes", "checksum", "pseudo_width", "pseudo_height"
    ]
    assert out["n_bytes"].tolist() == [3, 10]
    assert out["checksum"][0] == hashlib.sha256(b"abc").hexdigest()
    assert (out["pseudo_width"] < 1920).all()
    assert (out["pseudo_height"] < 1080).all()


def test_image_features_env_gate(spark):
    df = spark.createDataFrame(
        [(1, b"not-an-image")], ["doc_id", "payload"]
    )
    if not mm.HAVE_PIL:
        with pytest.raises(NotImplementedError, match="PIL"):
            mm.image_features(df)
        return
    # environments WITH PIL: undecodable payloads yield typed nulls,
    # decodable ones real dimensions
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (17, 9)).save(buf, format="PNG")
    df2 = spark.createDataFrame(
        [(1, b"not-an-image"), (2, buf.getvalue())], ["doc_id", "payload"]
    )
    rows = {r["doc_id"]: r for r in mm.image_features(df2).collect()}
    assert rows[1]["width"] is None and rows[1]["mode"] is None
    assert (rows[2]["width"], rows[2]["height"], rows[2]["mode"]) == (
        17, 9, "RGB"
    )


def test_frame_sample_matches_length_rule(spark):
    df = spark.createDataFrame(
        [(1, "x" * 250), (2, "y" * 99)], ["doc_id", "text"]
    )
    out = (
        df.select(
            "doc_id", (F.length("text") / 100).cast("int").alias("n_frames")
        )
        .where(F.col("n_frames") > 0)
        .collect()
    )
    assert [(r["doc_id"], r["n_frames"]) for r in out] == [(1, 2)]
