"""Specialized list codec: array<T> columns (embeddings) as a lengths
stream + recursively-coded flattened values stream, replacing the opaque
IPC fallback — so an embedding column's floats reach the float codecs
(bss/alp) and fixed-dim lists store no offsets at all. Round-trips must
be type- and bit-identical (field names and nullability included) on
the pyarrow layer, the kernel decode path, and the named source/sink."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from fhirflat_spark.codecs import decode_array, encode_array
from fhirflat_spark.codecs.core import unpack_chunk
from fhirflat_spark.decode import decode_table, verify_table
from fhirflat_spark.encode import append_table, encode_table

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

_CASES = {
    "fixed_f32": pa.FixedSizeListArray.from_arrays(
        pa.array(np.arange(40, dtype=np.float32)), 4
    ),
    "emb_f32": pa.array(
        [[float(i), i + 0.5] for i in range(100)], type=pa.list_(pa.float32())
    ),
    "ragged_i64": pa.array([[1, 2, 3], [4], [], [5, 6]],
                           type=pa.list_(pa.int64())),
    "large_str": pa.array([["a", "bb"], ["ccc"]],
                          type=pa.large_list(pa.string())),
    "nulls_top": pa.array([[1.0, 2.0], None, [3.0]],
                          type=pa.list_(pa.float64())),
    "nulls_elem": pa.array([[1, None], [None], [2]],
                           type=pa.list_(pa.int32())),
    "nested": pa.array([[[1, 2], [3]], [[4]]],
                       type=pa.list_(pa.list_(pa.int64()))),
    "all_empty": pa.array([[], [], []], type=pa.list_(pa.float32())),
    # Spark's arrow batches name the child field "element" and mark it
    # non-null when containsNull=false — both must survive the chunk
    "spark_shape": pa.array(
        [[1.0, 2.0], [3.0, 4.0]],
        type=pa.list_(pa.field("element", pa.float32(), nullable=False)),
    ),
}


@pytest.mark.parametrize("name", sorted(_CASES))
def test_list_roundtrip_bit_identical(name):
    arr = _CASES[name]
    blob = encode_array(arr)
    out = decode_array(blob)
    assert out.type == arr.type
    assert out.equals(arr)


def test_list_values_reach_float_codecs():
    """The point of the codec: embedding floats get a typed codec
    (bss/alp/zstd...), NOT the IPC fallback."""
    rng = np.random.default_rng(7)
    vals = pa.array(rng.random(64 * 512).astype(np.float32))
    arr = pa.FixedSizeListArray.from_arrays(vals, 64)
    blob = encode_array(arr)
    codec, _, _, meta, sections = unpack_chunk(blob)
    assert codec == "list"
    assert meta["kind"] == "fixed" and meta["dim"] == 64
    inner_codec = unpack_chunk(sections[-1])[0]
    assert inner_codec != "arrowz", inner_codec
    assert decode_array(blob).equals(arr)


def test_ragged_lengths_stream_is_coded():
    arr = pa.array([[1] * (i % 5) for i in range(1000)],
                   type=pa.list_(pa.int32()))
    blob = encode_array(arr)
    codec, n, _, meta, sections = unpack_chunk(blob)
    assert codec == "list" and n == 1000 and meta["kind"] == "list"
    assert len(sections) == 2  # lengths + values
    assert decode_array(blob).equals(arr)


@pytest.fixture(scope="module")
def emb_store(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("emb") / "store")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    encode_table(emb, out, rows_per_bucket=200)
    return out


def test_embeddings_table_roundtrip(spark, emb_store):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    dec = decode_table(spark, emb_store)
    assert dec.schema == emb.select(*dec.columns).schema
    a = sorted(tuple(r) for r in emb.select(*dec.columns).collect())
    b = sorted(tuple(r) for r in dec.collect())
    assert a == b
    assert verify_table(spark, emb_store).where(~F.col("ok")).count() == 0


def test_embeddings_datasource_and_sink(spark, emb_store, tmp_path):
    from fhirflat_spark.sources.datasource import register

    register(spark)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    ds = spark.read.format("fhirflat").load(emb_store)
    assert ds.count() == emb.count()
    out2 = str(tmp_path / "sink")
    emb.repartition(2).write.format("fhirflat").mode("append").save(out2)
    back = spark.read.format("fhirflat").load(out2)
    a = sorted(tuple(r) for r in emb.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b


def test_embeddings_append_and_column_prune(spark, emb_store, tmp_path):
    out = str(tmp_path / "ap")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    lo = emb.where(F.col("vec_id") % 2 == 0)
    hi = emb.where(F.col("vec_id") % 2 == 1)
    encode_table(lo, out, rows_per_bucket=200)
    append_table(hi, out, rows_per_bucket=200)
    dec = decode_table(spark, out)
    assert dec.count() == emb.count()
    # IO-pruned decode of just the scalar columns skips embedding bytes
    ids = decode_table(spark, out, columns=["vec_id"])
    assert ids.columns == ["vec_id"]
    assert ids.count() == emb.count()
