"""Position deletes (Iceberg v2 position-delete analog) and the
metadata-only physical dedup built on them: address exposure, exact
row removal on both read paths, keeper determinism, time travel,
re-insert visibility, and compaction materialization."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fhirflat_spark.decode import compact_table, decode_table
from fhirflat_spark.encode import append_table, encode_table
from fhirflat_spark.manifest import (
    active_delete_files,
    delete_rows_at,
    drop_duplicate_rows,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
POS = ("__part_id", "__chunk_seq", "__row_idx")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture()
def ds(spark, docs, tmp_path):
    out = str(tmp_path / "ds")
    encode_table(docs.where(F.col("doc_id") < 200), out, rows_per_bucket=50)
    return out


def test_positions_are_unique_addresses(spark, ds):
    df = decode_table(spark, ds, with_positions=True)
    n = df.count()
    assert df.select(*POS).distinct().count() == n
    assert set(POS) <= set(df.columns)


def test_delete_rows_at_removes_exactly_those_rows(spark, ds, docs):
    from fhirflat_spark.sources.datasource import register

    victims = (
        decode_table(spark, ds, with_positions=True)
        .where(F.col("doc_id").isin(3, 77, 123))
        .select(
            F.col("__part_id").alias("part_id"),
            F.col("__chunk_seq").alias("chunk_seq"),
            F.col("__row_idx").alias("row_idx"),
        )
    )
    stats = delete_rows_at(spark, ds, victims)
    assert stats["n_positions"] == 3
    dec = decode_table(spark, ds)
    assert dec.count() == 197
    assert dec.where(F.col("doc_id").isin(3, 77, 123)).count() == 0
    # the named source applies the same positional mask in-task
    register(spark)
    via = spark.read.format("fhirflat").option("path", ds).load()
    assert via.count() == 197
    assert via.where(F.col("doc_id").isin(3, 77, 123)).count() == 0
    # time travel: the pre-delete snapshot still shows the rows
    assert decode_table(spark, ds, snapshot=1).count() == 200


def test_drop_duplicate_rows_keeps_min_order(spark, docs, tmp_path):
    """Physical dedup: exactly one row per text survives — the smallest
    doc_id (the corpus ships genuine duplicate texts)."""
    out = str(tmp_path / "dd")
    # the corpus has no exact-dup texts: fabricate copies with shifted
    # ids so keeper order (min doc_id) is deterministic
    base = docs.where(F.col("doc_id") < 250).unionByName(
        docs.where(F.col("doc_id") < 50).withColumn(
            "doc_id", F.col("doc_id") + 1000)
    )
    encode_table(base, out, rows_per_bucket=50)
    n_dups = base.count() - base.select("text").distinct().count()
    assert n_dups == 50  # fixture sanity: duplicates exist
    stats = drop_duplicate_rows(spark, out, ["text"], order_cols=["doc_id"])
    assert stats["rows_dropped"] == n_dups
    dec = decode_table(spark, out)
    assert dec.count() == base.select("text").distinct().count()
    from pyspark.sql import Window

    exp = (
        base.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("text").orderBy("doc_id")),
        ).where(F.col("rn") == 1).drop("rn")
    )
    assert sorted(map(tuple, dec.collect())) == sorted(map(tuple, exp.collect()))
    # idempotent: nothing left to drop, no empty commit
    assert drop_duplicate_rows(spark, out, ["text"]) == {"rows_dropped": 0}


def test_reinserted_rows_stay_visible(spark, ds, docs):
    victims = (
        decode_table(spark, ds, with_positions=True)
        .where(F.col("doc_id") == 5)
        .select(
            F.col("__part_id").alias("part_id"),
            F.col("__chunk_seq").alias("chunk_seq"),
            F.col("__row_idx").alias("row_idx"),
        )
    )
    delete_rows_at(spark, ds, victims)
    append_table(docs.where(F.col("doc_id") == 5), ds, rows_per_bucket=50)
    # the re-inserted copy has a different address: visible
    assert decode_table(spark, ds).where(F.col("doc_id") == 5).count() == 1


def test_compaction_materializes_position_deletes(spark, docs, tmp_path):
    out = str(tmp_path / "dupc")
    base = docs.where(F.col("doc_id") < 100).unionByName(
        docs.where(F.col("doc_id") < 30).withColumn(
            "doc_id", F.col("doc_id") + 1000)
    )
    encode_table(base, out, rows_per_bucket=50)
    stats = drop_duplicate_rows(spark, out, ["text"], order_cols=["doc_id"])
    assert stats["rows_dropped"] == 30
    kept = decode_table(spark, out).count()
    assert kept == 100
    dst = str(tmp_path / "compacted")
    compact_table(spark, out, dst)
    assert decode_table(spark, dst).count() == kept
    assert active_delete_files(dst) == []


def test_bad_positions_rejected(spark, ds):
    with pytest.raises(ValueError, match="positions need columns"):
        delete_rows_at(spark, ds, decode_table(spark, ds).select("doc_id"))


def test_collapse_near_duplicates_in_place(spark, docs, tmp_path):
    """Exact + near-dup curation as one metadata-only commit: fabricated
    exact copies AND lightly-edited near copies both collapse to the
    min-id keeper; originals survive untouched."""
    from fhirflat_spark.operators.dedup import collapse_near_duplicates

    out = str(tmp_path / "near")
    base = docs.where(F.col("doc_id") < 120)
    exact_copies = docs.where(F.col("doc_id") < 20).withColumn(
        "doc_id", F.col("doc_id") + 1000)
    near_copies = (
        docs.where(F.col("doc_id").between(20, 39))
        .withColumn("doc_id", F.col("doc_id") + 2000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" trailing edit")))
    )
    encode_table(base.unionByName(exact_copies).unionByName(near_copies),
                 out, rows_per_bucket=50)
    stats = collapse_near_duplicates(spark, out)
    assert stats["exact_dups"] == 20
    assert stats["near_dups"] > 0  # LSH catches the light edits
    dec = decode_table(spark, out)
    assert dec.count() == 160 - stats["rows_dropped"]
    ids = {r["doc_id"] for r in dec.select("doc_id").collect()}
    # every exact copy is gone (its original has the smaller id)
    assert not any(1000 <= i < 2000 for i in ids)
    # most fabricated near copies collapse onto their originals — LSH
    # banding is probabilistic (a copy whose edit shifts the banded
    # signature rows can slip through), so the bound is recall-style,
    # not per-pair
    assert sum(1 for i in ids if i >= 2000) < 10
    # idempotent second run
    assert collapse_near_duplicates(spark, out)["rows_dropped"] == 0


def test_collapse_rejects_non_unique_id(spark, docs, tmp_path):
    out = str(tmp_path / "badid")
    encode_table(
        docs.where(F.col("doc_id") < 40)
        .withColumn("doc_id", F.col("doc_id") % 10),
        out, rows_per_bucket=50,
    )
    from fhirflat_spark.operators.dedup import collapse_near_duplicates

    with pytest.raises(ValueError, match="UNIQUE id column"):
        collapse_near_duplicates(spark, out)


def test_table_changes_reports_position_deletes(spark, ds, docs):
    """CDF fast path over a positional-delete commit: the entry has no
    key column (column=None) — the diff must semi-join on the physical
    address, not a value column (caught by the lifecycle fuzzer)."""
    from fhirflat_spark.changes import table_changes
    from fhirflat_spark.manifest import current_snapshot

    v0 = current_snapshot(ds)
    doomed = [3, 57, 111]
    pos = (
        decode_table(spark, ds, with_positions=True)
        .where(F.col("doc_id").isin(doomed))
        .select(
            F.col("__part_id").alias("part_id"),
            F.col("__chunk_seq").alias("chunk_seq"),
            F.col("__row_idx").alias("row_idx"),
        )
    )
    delete_rows_at(spark, ds, pos)
    v1 = current_snapshot(ds)
    ch = table_changes(spark, ds, v0, v1)
    rows = ch.select("doc_id", "_change_type").collect()
    assert sorted(r["doc_id"] for r in rows) == doomed
    assert {r["_change_type"] for r in rows} == {"delete"}
    # net CDF across a mixed window: an append AND a positional delete
    append_table(
        docs.where(F.col("doc_id").between(200, 219)), ds,
        rows_per_bucket=50,
    )
    pos2 = (
        decode_table(spark, ds, with_positions=True)
        .where(F.col("doc_id") == 120)
        .select(
            F.col("__part_id").alias("part_id"),
            F.col("__chunk_seq").alias("chunk_seq"),
            F.col("__row_idx").alias("row_idx"),
        )
    )
    delete_rows_at(spark, ds, pos2)
    ch2 = table_changes(spark, ds, v1, current_snapshot(ds))
    got = {(r["doc_id"], r["_change_type"])
           for r in ch2.select("doc_id", "_change_type").collect()}
    assert got == ({(i, "insert") for i in range(200, 220)}
                   | {(120, "delete")})
