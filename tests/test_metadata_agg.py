"""Metadata-only aggregates (manifest.aggregate_from_metadata): exact
count(*)/count(col)/min/max/sum from the snapshot manifest with ZERO
chunk IO, and every documented fall-back-to-scan condition returning
None instead of a wrong answer."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from fhirflat_spark.decode import decode_table
from fhirflat_spark.encode import append_table, encode_table
from fhirflat_spark.manifest import aggregate_from_metadata, delete_rows

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def ds(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("magg") / "ds")
    encode_table(docs, out, rows_per_bucket=100)
    return out


def test_matches_exact_scan(spark, ds, docs):
    agg = aggregate_from_metadata(ds, ["doc_id", "n_chars", "text"])
    exp = docs.agg(
        F.count("*"), F.min("doc_id"), F.max("doc_id"),
        F.min("n_chars"), F.max("n_chars"), F.sum("n_chars"),
        F.count("text"),
    ).collect()[0]
    assert agg is not None
    assert agg["rows"] == exp[0]
    assert agg["min"]["doc_id"] == exp[1]
    assert agg["max"]["doc_id"] == exp[2]
    assert agg["min"]["n_chars"] == exp[3]
    assert agg["max"]["n_chars"] == exp[4]
    assert agg["sum"]["n_chars"] == exp[5]
    assert agg["nonnull"]["text"] == exp[6]
    # strings carry counts but no min/max/sum (truncated zone bounds)
    assert "text" not in agg["min"] and "text" not in agg["sum"]


def test_answers_without_any_chunk_io(spark, ds, docs, tmp_path):
    """The whole point: delete every chunk payload file — the manifest
    alone still answers, and answers correctly."""
    gutted = str(tmp_path / "gutted")
    shutil.copytree(ds, gutted)
    shutil.rmtree(os.path.join(gutted, "chunks"))
    agg = aggregate_from_metadata(gutted, ["doc_id"])
    assert agg is not None and agg["rows"] == docs.count()
    assert agg["min"]["doc_id"] == 0
    assert agg["sum"]["doc_id"] == docs.count() * (docs.count() - 1) // 2


def test_null_aware_columns(spark, docs, tmp_path):
    """NULL-bearing int column: exact null_count, and min/max/sum ignore
    the NULLs (the zone/sum kernels skip them)."""
    out = str(tmp_path / "nulls")
    df = docs.where(F.col("doc_id") < 100).withColumn(
        "maybe",
        F.when(F.col("doc_id") % 3 == 0, F.col("doc_id")).otherwise(
            F.lit(None).cast("long")),
    )
    encode_table(df, out, rows_per_bucket=50)
    agg = aggregate_from_metadata(out, ["maybe"])
    exp = df.agg(F.count("maybe"), F.min("maybe"), F.max("maybe"),
                 F.sum("maybe")).collect()[0]
    assert agg is not None
    assert agg["nonnull"]["maybe"] == exp[0]
    assert agg["null_count"]["maybe"] == 100 - exp[0]
    assert (agg["min"]["maybe"], agg["max"]["maybe"]) == (exp[1], exp[2])
    assert agg["sum"]["maybe"] == exp[3]


def test_all_null_column_is_sql_null(spark, docs, tmp_path):
    out = str(tmp_path / "allnull")
    df = docs.where(F.col("doc_id") < 100).withColumn(
        "void", F.lit(None).cast("long"))
    encode_table(df, out, rows_per_bucket=50)
    agg = aggregate_from_metadata(out, ["void"])
    assert agg is not None
    assert agg["null_count"]["void"] == 100 and agg["nonnull"]["void"] == 0
    assert agg["min"]["void"] is None
    assert agg["max"]["void"] is None
    assert agg["sum"]["void"] is None


def test_float_column_min_max_no_sum(spark, docs, tmp_path):
    out = str(tmp_path / "flt")
    df = docs.where(F.col("doc_id") < 100).withColumn(
        "price", (F.col("doc_id") * 0.25).cast("double"))
    encode_table(df, out, rows_per_bucket=50)
    agg = aggregate_from_metadata(out, ["price"])
    assert agg is not None
    assert (agg["min"]["price"], agg["max"]["price"]) == (0.0, 99 * 0.25)
    assert "price" not in agg["sum"]  # float sums drift: not tracked


def test_non_finite_float_falls_back(spark, docs, tmp_path):
    """A partition holding NaN/inf records no zone; with non-NULL values
    present the manifest must refuse rather than report wrong extrema."""
    out = str(tmp_path / "nan")
    df = docs.where(F.col("doc_id") < 100).withColumn(
        "price",
        F.when(F.col("doc_id") == 7, F.lit(float("nan"))).otherwise(
            F.col("doc_id") * 1.0),
    )
    encode_table(df, out, rows_per_bucket=50)
    assert aggregate_from_metadata(out, ["price"]) is None


def test_unknown_column_falls_back(spark, ds):
    assert aggregate_from_metadata(ds, ["nope"]) is None


def test_active_deletes_fall_back(spark, docs, tmp_path):
    out = str(tmp_path / "del")
    encode_table(docs.where(F.col("doc_id") < 100), out, rows_per_bucket=50)
    assert aggregate_from_metadata(out, ["doc_id"]) is not None
    delete_rows(spark, out, "doc_id", [0])
    # deleted rows are invisible to partition stats → must refuse
    assert aggregate_from_metadata(out, ["doc_id"]) is None
    # but the PRE-delete snapshot is still servable (time travel)
    agg = aggregate_from_metadata(out, ["doc_id"], snapshot=1)
    assert agg is not None and agg["rows"] == 100


def test_schema_evolution_absent_is_all_null(spark, docs, tmp_path):
    """An appended column is all-NULL in pre-evolution partitions; the
    nulls rollup explains the missing zones, so the answer stays exact
    (and matches what a scan computes)."""
    out = str(tmp_path / "evo")
    encode_table(
        docs.where(F.col("doc_id") < 50).select("doc_id", "text"),
        out, rows_per_bucket=50,
    )
    append_table(
        docs.where(F.col("doc_id").between(50, 99))
        .select("doc_id", "text")
        .withColumn("extra", F.col("doc_id") * 2),
        out, rows_per_bucket=50,
    )
    agg = aggregate_from_metadata(out, ["extra", "doc_id"])
    dec = decode_table(spark, out)
    exp = dec.agg(F.count("extra"), F.min("extra"), F.max("extra"),
                  F.sum("extra")).collect()[0]
    assert agg is not None and agg["rows"] == 100
    assert agg["nonnull"]["extra"] == exp[0] == 50
    assert (agg["min"]["extra"], agg["max"]["extra"]) == (exp[1], exp[2])
    assert agg["sum"]["extra"] == exp[3]
    assert agg["max"]["doc_id"] == 99


def test_snapshot_time_travel_values(spark, docs, tmp_path):
    out = str(tmp_path / "tt")
    encode_table(docs.where(F.col("doc_id") < 50), out, rows_per_bucket=50)
    append_table(docs.where(F.col("doc_id").between(50, 79)), out,
                 rows_per_bucket=50)
    a1 = aggregate_from_metadata(out, ["doc_id"], snapshot=1)
    a2 = aggregate_from_metadata(out, ["doc_id"])
    assert (a1["rows"], a1["max"]["doc_id"]) == (50, 49)
    assert (a2["rows"], a2["max"]["doc_id"]) == (80, 79)


def test_transcode_carries_stats(spark, docs, tmp_path):
    """Compaction/transcode re-derives the rollups from the carried
    chunk stats — the rewritten table stays metadata-servable."""
    from fhirflat_spark.decode import transcode_table

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    encode_table(docs.where(F.col("doc_id") < 100), src, rows_per_bucket=25)
    transcode_table(spark, src, dst)
    agg = aggregate_from_metadata(dst, ["doc_id", "n_chars"])
    assert agg is not None and agg["rows"] == 100
    assert agg["max"]["doc_id"] == 99
    exp = docs.where(F.col("doc_id") < 100).agg(F.sum("n_chars")).collect()
    assert agg["sum"]["n_chars"] == exp[0][0]


def test_oracle_query_matches_duckdb_shape(spark):
    """The registered query returns the oracle's exact column set and
    values at this sf (mirrors the driver gate locally)."""
    import duckdb

    from fhirflat_spark.operators.storage import q_metadata_only_aggregate

    got = q_metadata_only_aggregate(spark, SF).collect()[0]
    exp = duckdb.sql(
        "SELECT count(*), min(doc_id), max(doc_id), min(n_chars), "
        "max(n_chars), CAST(sum(n_chars) AS BIGINT), count(text) "
        f"FROM '{SF}/documents.parquet'"
    ).fetchone()
    assert tuple(got) == tuple(exp)
