"""Metadata-only aggregates (manifest.aggregate_from_metadata): exact
count/min/max from the snapshot manifest with ZERO chunk IO, and every
documented fall-back-to-scan condition returning None instead of a
wrong answer."""

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
    agg = aggregate_from_metadata(ds, ["doc_id", "n_chars"])
    exp = docs.agg(
        F.count("*"), F.min("doc_id"), F.max("doc_id"),
        F.min("n_chars"), F.max("n_chars"),
    ).collect()[0]
    assert agg is not None
    assert agg["rows"] == exp[0]
    assert agg["min"]["doc_id"] == exp[1]
    assert agg["max"]["doc_id"] == exp[2]
    assert agg["min"]["n_chars"] == exp[3]
    assert agg["max"]["n_chars"] == exp[4]


def test_answers_without_any_chunk_io(spark, ds, docs, tmp_path):
    """The whole point: delete every chunk payload file — the manifest
    alone still answers, and answers correctly."""
    gutted = str(tmp_path / "gutted")
    shutil.copytree(ds, gutted)
    shutil.rmtree(os.path.join(gutted, "chunks"))
    agg = aggregate_from_metadata(gutted, ["doc_id"])
    assert agg is not None and agg["rows"] == docs.count()
    assert agg["min"]["doc_id"] == 0


def test_string_column_falls_back(spark, ds):
    # string zones are truncated prefix/successor bounds — never exact
    assert aggregate_from_metadata(ds, ["lang"]) is None


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


def test_schema_evolved_partition_falls_back(spark, docs, tmp_path):
    """An appended column is absent (all-NULL) in pre-evolution
    partitions, so its zones can't bound the whole table — refuse."""
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
    assert aggregate_from_metadata(out, ["extra"]) is None
    # the column present everywhere still serves across the evolution
    agg = aggregate_from_metadata(out, ["doc_id"])
    assert agg is not None and agg["rows"] == 100 and agg["max"]["doc_id"] == 99


def test_snapshot_time_travel_values(spark, docs, tmp_path):
    out = str(tmp_path / "tt")
    encode_table(docs.where(F.col("doc_id") < 50), out, rows_per_bucket=50)
    append_table(docs.where(F.col("doc_id").between(50, 79)), out,
                 rows_per_bucket=50)
    a1 = aggregate_from_metadata(out, ["doc_id"], snapshot=1)
    a2 = aggregate_from_metadata(out, ["doc_id"])
    assert (a1["rows"], a1["max"]["doc_id"]) == (50, 49)
    assert (a2["rows"], a2["max"]["doc_id"]) == (80, 79)


def test_oracle_query_matches_duckdb_shape(spark):
    """The registered query returns the oracle's exact column set and
    values at this sf (mirrors the driver gate locally)."""
    import duckdb

    from fhirflat_spark.operators.storage import q_metadata_only_aggregate

    got = q_metadata_only_aggregate(spark, SF).collect()[0]
    exp = duckdb.sql(
        "SELECT count(*), min(doc_id), max(doc_id), min(n_chars), "
        f"max(n_chars) FROM '{SF}/documents.parquet'"
    ).fetchone()
    assert tuple(got) == tuple(exp)
