"""Dictionary-domain pushed-filter evaluation in the named source
(datasource.py `_encoded_filter_ctx` / `_encoded_pred_mask`): predicates
on dict/rle/constant chunks run against the distinct values and fan out
through the code stream — results must be row-identical to the decoded
path for every op, including NULL rows and mistyped literals.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from fhirflat_spark.codecs import encode_array
from fhirflat_spark.sources.datasource import (
    _ctx_materialize,
    _encoded_filter_ctx,
    _encoded_pred_mask,
    _pred_mask,
)

ARRS = {
    "dict": pa.array(["ab", "cd", "ab", "ef", None, "cd", "ab"]),
    "rle": pa.array(["x", "x", "y", "y", "y", None, "z"]),
    "constant": pa.array(["kk"] * 6),
    "int_dict": pa.array([7, 9, 7, None, 11, 7], type=pa.int64()),
}
CODEC_OF = {"dict": "dict", "rle": "rle", "constant": "constant",
            "int_dict": "dict"}
OPS = [
    ("eq", "ab"), ("eq", "zz"), ("in", ("ab", "z", "kk")),
    ("lt", "cd"), ("le", "cd"), ("gt", "x"), ("ge", "y"),
    ("sw", "a"), ("sw", "k"), ("nu", None), ("nn", None),
]


@pytest.mark.parametrize("name", [k for k in ARRS if ARRS[k].type == pa.string()])
@pytest.mark.parametrize("op,v", OPS, ids=[f"{o}-{v}" for o, v in OPS])
def test_encoded_mask_equals_decoded_mask(name, op, v):
    arr = ARRS[name]
    ctx = _encoded_filter_ctx(encode_array(arr, codec=CODEC_OF[name]),
                              arr.type)
    assert ctx is not None, "fast path must engage for this codec"
    got = _encoded_pred_mask(ctx, op, v)
    exp = _pred_mask(arr, op, v)
    assert not isinstance(got, str)
    assert got.to_pylist() == exp.to_pylist()


def test_encoded_mask_int_ops():
    arr = ARRS["int_dict"]
    ctx = _encoded_filter_ctx(encode_array(arr, codec="dict"), arr.type)
    for op, v in [("eq", 7), ("gt", 8), ("le", 9), ("in", (9, 11)),
                  ("nu", None), ("nn", None)]:
        got = _encoded_pred_mask(ctx, op, v)
        exp = _pred_mask(arr, op, v)
        assert got.to_pylist() == exp.to_pylist(), (op, v)


def test_mistyped_literal_keeps_rows():
    arr = ARRS["int_dict"]
    ctx = _encoded_filter_ctx(encode_array(arr, codec="dict"), arr.type)
    assert _encoded_pred_mask(ctx, "eq", "not-an-int") == "keep"
    assert _pred_mask(arr, "eq", "not-an-int") is None


def test_ctx_materialize_bit_identical():
    for name, arr in ARRS.items():
        ctx = _encoded_filter_ctx(encode_array(arr, codec=CODEC_OF[name]),
                                  arr.type)
        out = _ctx_materialize(ctx)
        assert out.type == arr.type
        assert out.to_pylist() == arr.to_pylist()


def test_heavy_codecs_decline():
    s = pa.array([f"v{i}" for i in range(500)])
    for codec in ("zstd", "raw"):
        assert _encoded_filter_ctx(encode_array(s, codec=codec),
                                   s.type) is None
    f = pa.array(np.arange(100, dtype=np.float64))
    assert _encoded_filter_ctx(encode_array(f, codec="bss"), f.type) is None


def test_reader_rows_identical_with_dict_filter_column(spark, tmp_path):
    """End-to-end: pushed equality on a dict-coded column through the
    in-process reader returns exactly the decoded-path rows, and the
    boundary row count equals the true match count (the all-miss chunks
    were skipped from the code stream alone)."""
    from pyspark.sql.datasource import EqualTo

    from fhirflat_spark.encode import encode_table
    from fhirflat_spark.sources.datasource import FhirflatBatchReader

    df = spark.createDataFrame(
        [(i, ["red", "green", "blue", "teal"][i % 4] if i % 11 else None,
          i * 3) for i in range(2000)],
        "id BIGINT, color STRING, n BIGINT",
    )
    out = str(tmp_path / "ds")
    encode_table(df, out, rows_per_bucket=500)

    rdr = FhirflatBatchReader({"path": out}, None)
    rdr.pushFilters([EqualTo(("color",), "teal")])
    rows = [
        tuple(t)
        for p in rdr.partitions()
        for b in rdr.read(p)
        for t in zip(*[c.to_pylist() for c in b.columns])
    ]
    exp = sorted(
        map(tuple, df.where("color = 'teal'").collect())
    )
    assert sorted(rows) == exp
    # row-level pushdown exactness: only true matches crossed
    assert len(rows) == len(exp)


def test_reader_null_filter_on_dict_column(spark, tmp_path):
    from pyspark.sql.datasource import IsNull

    from fhirflat_spark.encode import encode_table
    from fhirflat_spark.sources.datasource import FhirflatBatchReader

    df = spark.createDataFrame(
        [(i, "c" if i % 7 else None) for i in range(600)],
        "id BIGINT, color STRING",
    )
    out = str(tmp_path / "ds")
    encode_table(df, out, rows_per_bucket=200)
    rdr = FhirflatBatchReader({"path": out}, None)
    rdr.pushFilters([IsNull(("color",))])
    got = sum(b.num_rows for p in rdr.partitions() for b in rdr.read(p))
    assert got == df.where("color IS NULL").count()
