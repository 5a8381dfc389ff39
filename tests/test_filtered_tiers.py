"""Tiered filtered COUNT/SUM (encoded_exec.count_encoded/sum_encoded
with a WHERE): partitions whose manifest rollups entail the predicate
answer from metadata (zero chunk IO), zone-missed partitions contribute
nothing, straddlers scan only the predicate columns."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from fhirflat_spark.encode import append_table, encode_table
from fhirflat_spark.encoded_exec import count_encoded, sum_encoded


def _ranged(spark, tmp_path):
    df = spark.range(0, 4000).select(
        F.col("id"),
        (F.col("id") * 3).alias("val"),
        F.when(F.col("id") % 7 == 0, None)
        .otherwise(F.col("id") % 5).cast("bigint").alias("w"),
    )
    out = str(tmp_path / "ds")
    encode_table(df.repartitionByRange(8, "val").sortWithinPartitions("val"),
                 out, rows_per_bucket=500, shuffle=False)
    return out, df


def test_count_tiers_match_spark(spark, tmp_path):
    out, df = _ranged(spark, tmp_path)
    for cut in (0, 2999, 3000, 3001, 11000, 99999):
        rep: dict = {}
        got = count_encoded(spark, out, where=("val", "ge", cut),
                            report=rep)
        assert got == df.where(f"val >= {cut}").count(), cut
        assert rep["parts_metadata"] + rep["parts_scanned"] <= 8
    # a mid-range cut must actually split the tiers
    rep = {}
    count_encoded(spark, out, where=("val", "ge", 3001), report=rep)
    assert rep["parts_metadata"] > 0 and rep["parts_scanned"] > 0


def test_sum_tiers_match_spark(spark, tmp_path):
    out, df = _ranged(spark, tmp_path)
    rep: dict = {}
    got = sum_encoded(spark, out, "val", where=("val", "ge", 3001),
                      report=rep)
    exp = df.where("val >= 3001").agg(F.sum("val")).collect()[0][0]
    assert got == exp
    assert rep["parts_metadata"] > 0 and rep["parts_scanned"] > 0
    assert rep["sum_metadata"] is not None
    # nullable value column: entailed partitions use the sums rollup,
    # SQL skip-null semantics hold
    got = sum_encoded(spark, out, "w", where=("val", "ge", 3001))
    exp = df.where("val >= 3001").agg(F.sum("w")).collect()[0][0]
    assert got == exp
    # empty match → SQL NULL
    assert sum_encoded(spark, out, "val", where=("val", "ge", 99999)) \
        is None


def test_fully_entailed_needs_no_chunk_files(spark, tmp_path):
    """When every partition is entailed or pruned, the answer is pure
    metadata — remove every chunk file and it still serves."""
    out, df = _ranged(spark, tmp_path)
    for f in glob.glob(f"{out}/chunks/**/*.parquet", recursive=True):
        os.remove(f)
    rep: dict = {}
    assert count_encoded(spark, out, where=("val", "ge", 0),
                         report=rep) == 4000
    assert rep["parts_scanned"] == 0 and rep["rows_metadata"] == 4000
    exp = df.agg(F.sum("val")).collect()[0][0]
    assert sum_encoded(spark, out, "val", where=("val", "ge", 0)) == exp
    # zone-missed everywhere: zero without touching anything
    assert count_encoded(spark, out, where=("val", "lt", 0)) == 0


def test_tiers_respect_snapshot(spark, tmp_path):
    out = str(tmp_path / "ds")
    a = spark.createDataFrame([(i, i) for i in range(100)],
                              "id BIGINT, n BIGINT")
    b = spark.createDataFrame([(1000 + i, 1000 + i) for i in range(50)],
                              "id BIGINT, n BIGINT")
    encode_table(a, out, rows_per_bucket=50)
    append_table(b, out, rows_per_bucket=50)
    assert count_encoded(spark, out, where=("n", "ge", 0)) == 150
    assert count_encoded(spark, out, where=("n", "ge", 0), snapshot=1) \
        == 100
    assert sum_encoded(spark, out, "n", where=("n", "ge", 0), snapshot=1) \
        == sum(range(100))


def test_tiers_refuse_active_deletes(spark, tmp_path):
    from fhirflat_spark.manifest import delete_rows

    out, _df = _ranged(spark, tmp_path)
    delete_rows(spark, out, "id", [5, 10])
    with pytest.raises(ValueError, match="row-level deletes"):
        count_encoded(spark, out, where=("val", "ge", 0))
