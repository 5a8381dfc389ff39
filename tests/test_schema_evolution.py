"""Schema evolution (Iceberg add-column semantics): appends may add
columns — old partitions are never rewritten, decode fills typed nulls —
and may omit existing columns, which null-fill from the dataset schema.
Shared columns with a different Spark type are rejected (no silent
coercion). Payload fields are positionally stable, so every pre-evolution
chunk stays readable as-is.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


@pytest.fixture()
def evolved(spark, tmp_path):
    """base (no 'quality') + evolved append (adds double 'quality',
    drops 'source')."""
    from fhirflat_spark.encode import append_table, encode_table

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = docs.where(F.col("doc_id") % 2 == 0)
    delta = (
        docs.where(F.col("doc_id") % 2 == 1)
        .withColumn("quality", (F.col("doc_id") % 7).cast("double") / 2.0)
        .drop("source")
    )
    out = str(tmp_path / "ds")
    encode_table(base, out, rows_per_bucket=500)
    append_table(delta, out, rows_per_bucket=500)
    return out, base, delta


def test_added_column_decodes_with_typed_nulls(spark, evolved):
    from fhirflat_spark.decode import decode_table

    out, base, delta = evolved
    dec = decode_table(spark, out)
    assert dec.columns == [*base.columns, "quality"]
    assert dec.schema["quality"].dataType == T.DoubleType()
    old = dec.where(F.col("doc_id") % 2 == 0)
    assert old.where(F.col("quality").isNotNull()).count() == 0
    new = dec.where(F.col("doc_id") % 2 == 1)
    assert new.where(F.col("quality").isNull()).count() == 0
    # omitted column null-filled on the delta side
    assert new.where(F.col("source").isNotNull()).count() == 0
    # non-evolved columns bit-equal to their sources
    joined = base.unionByName(delta.drop("quality"), allowMissingColumns=True)
    assert dec.drop("quality").exceptAll(joined).count() == 0


def test_selective_decode_of_added_column_only(spark, evolved):
    from fhirflat_spark.decode import decode_table

    out, base, delta = evolved
    q = decode_table(spark, out, columns=["doc_id", "quality"])
    assert q.columns == ["doc_id", "quality"]
    assert q.count() == base.count() + delta.count()
    assert q.where(F.col("quality").isNotNull()).count() == delta.count()


def test_verify_skips_pre_evolution_chunks_for_added_column(spark, evolved):
    from fhirflat_spark.decode import verify_table

    out, *_ = evolved
    assert verify_table(spark, out).where(~F.col("ok")).count() == 0
    assert (
        verify_table(spark, out, columns=["quality"])
        .where(~F.col("ok")).count() == 0
    )


def test_type_conflict_rejected(spark, evolved):
    from fhirflat_spark.encode import append_table

    out, base, _ = evolved
    bad = base.limit(5).withColumn("quality", F.lit("oops"))
    with pytest.raises(ValueError, match="type"):
        append_table(bad, out, rows_per_bucket=500)


def test_snapshot_decode_under_evolved_schema(spark, evolved):
    """Time travel to the pre-evolution snapshot reads under the CURRENT
    schema (the documented semantics): old rows only, added column all
    null."""
    from fhirflat_spark.decode import decode_table

    out, base, _ = evolved
    s1 = decode_table(spark, out, snapshot=1)
    assert s1.count() == base.count()
    assert s1.where(F.col("quality").isNotNull()).count() == 0


def test_transcode_carries_absence_through(spark, evolved, tmp_path):
    from fhirflat_spark.decode import decode_table, transcode_table, verify_table

    out, base, delta = evolved
    dst = str(tmp_path / "ds9")
    transcode_table(spark, out, dst, profile="archive")
    d9 = decode_table(spark, dst)
    assert d9.count() == base.count() + delta.count()
    assert (
        d9.where(F.col("doc_id") % 2 == 0)
        .where(F.col("quality").isNotNull()).count() == 0
    )
    assert verify_table(spark, dst).where(~F.col("ok")).count() == 0
