"""Row-level deletes (Iceberg v2 equality-delete analog): delete commits
touch no chunk file, readers anti-join the active delete files, time
travel and rollback move the delete set with the snapshot, compaction
materializes deletes physically, and expire+vacuum reclaim unreferenced
delete files.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def deleted(spark, tmp_path):
    from fhirflat_spark.encode import encode_table
    from fhirflat_spark.manifest import delete_rows

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "ds")
    encode_table(docs, out, rows_per_bucket=500)
    victims = [
        r["doc_id"]
        for r in docs.where(F.col("doc_id") % 7 == 0)
        .select("doc_id").collect()
    ]
    info = delete_rows(spark, out, "doc_id", victims)
    assert info["snapshot"] == 2 and info["n_keys"] == len(victims)
    return out, docs, victims


def test_delete_hides_rows_without_touching_chunks(spark, deleted):
    from fhirflat_spark.decode import decode_table, verify_table

    out, docs, victims = deleted
    dec = decode_table(spark, out)
    assert dec.count() == docs.count() - len(victims)
    assert dec.where(F.col("doc_id") % 7 == 0).count() == 0
    # chunk bytes untouched: physical verification still green over the
    # full (pre-delete) chunk set
    assert verify_table(spark, out).where(~F.col("ok")).count() == 0


def test_selective_decode_applies_delete_without_key_column(spark, deleted):
    from fhirflat_spark.decode import decode_table

    out, docs, victims = deleted
    sel = decode_table(spark, out, columns=["lang"])
    assert sel.columns == ["lang"]
    assert sel.count() == docs.count() - len(victims)


def test_time_travel_and_rollback_move_the_delete_set(spark, deleted):
    from fhirflat_spark.decode import decode_table
    from fhirflat_spark.manifest import rollback

    out, docs, victims = deleted
    assert decode_table(spark, out, snapshot=1).count() == docs.count()
    assert (
        decode_table(spark, out, snapshot=2).count()
        == docs.count() - len(victims)
    )
    rollback(spark, out, 1)  # un-delete
    assert decode_table(spark, out).count() == docs.count()
    rollback(spark, out, 2)  # re-delete
    assert decode_table(spark, out).count() == docs.count() - len(victims)


def test_append_after_delete_keeps_it_active(spark, deleted):
    from fhirflat_spark.decode import decode_table
    from fhirflat_spark.encode import append_table

    out, docs, victims = deleted
    extra = docs.limit(40).withColumn("doc_id", F.col("doc_id") + 100_000)
    append_table(extra, out, rows_per_bucket=500)
    dec = decode_table(spark, out)
    assert dec.count() == docs.count() - len(victims) + 40
    assert (
        dec.where((F.col("doc_id") % 7 == 0) & (F.col("doc_id") < 100_000))
        .count() == 0
    )


def test_compaction_materializes_deletes(spark, deleted, tmp_path):
    from fhirflat_spark.decode import compact_table, decode_table
    from fhirflat_spark.manifest import active_delete_files

    out, docs, victims = deleted
    dst = str(tmp_path / "ds9")
    compact_table(spark, out, dst, rows_per_bucket=2000)
    assert active_delete_files(dst) == []
    dec = decode_table(spark, dst)
    assert dec.count() == docs.count() - len(victims)
    assert dec.where(F.col("doc_id") % 7 == 0).count() == 0


def test_expire_vacuum_keeps_referenced_delete_files(spark, deleted):
    from fhirflat_spark.decode import decode_table
    from fhirflat_spark.manifest import expire_snapshots, vacuum

    out, docs, victims = deleted
    expire_snapshots(out, keep_last=1)
    vacuum(spark, out)
    # the current snapshot still references the delete file: retained
    assert os.listdir(f"{out}/deletes") == ["d0000000002.parquet"]
    assert decode_table(spark, out).count() == docs.count() - len(victims)


def test_rollback_then_expire_vacuum_reclaims_delete_file(spark, deleted):
    from fhirflat_spark.decode import decode_table
    from fhirflat_spark.manifest import (
        expire_snapshots,
        rollback,
        vacuum,
    )

    out, docs, victims = deleted
    rollback(spark, out, 1)  # current = un-deleted state
    expire_snapshots(out, keep_last=1)
    vacuum(spark, out)
    assert os.listdir(f"{out}/deletes") == []
    assert decode_table(spark, out).count() == docs.count()


def test_delete_validation(spark, deleted):
    from fhirflat_spark.manifest import delete_rows

    out, *_ = deleted
    with pytest.raises(ValueError, match="not in"):
        delete_rows(spark, out, "nope", [1])
    with pytest.raises(ValueError, match="non-empty"):
        delete_rows(spark, out, "doc_id", [])
