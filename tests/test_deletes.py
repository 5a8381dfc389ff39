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
    kept = os.listdir(f"{out}/deletes")
    assert len(kept) == 1 and kept[0].startswith("d0000000002-")
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


def test_scoped_delete_allows_reinsert(spark, deleted):
    """A delete is scoped to the partitions existing at delete time (the
    sequence-number analog): appending a previously-deleted key makes it
    visible again instead of being swallowed by the old delete file."""
    from fhirflat_spark.decode import decode_table
    from fhirflat_spark.encode import append_table

    out, docs, victims = deleted
    reinsert = docs.where(F.col("doc_id").isin(victims[:5]))
    append_table(reinsert, out, rows_per_bucket=500)
    dec = decode_table(spark, out)
    assert dec.count() == docs.count() - len(victims) + 5
    assert dec.where(F.col("doc_id").isin(victims[:5])).count() == 5


def test_upsert_single_commit_merge(spark, tmp_path):
    """upsert_rows = ONE snapshot commit appending the delta and
    shadow-deleting matched keys in pre-existing partitions: no
    duplicates, updates visible, inserts present, untouched rows
    untouched, and time travel shows the pre-merge table."""
    from fhirflat_spark.decode import decode_table
    from fhirflat_spark.encode import encode_table, upsert_rows
    from fhirflat_spark.manifest import current_snapshot

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "ds")
    encode_table(docs.where(F.col("doc_id") < 400), out, rows_per_bucket=500)
    delta = (
        docs.where(F.col("doc_id").between(200, 499))
        .withColumn("n_chars", F.col("n_chars") + 1000)
    )
    upsert_rows(delta, out, "doc_id", rows_per_bucket=500)
    assert current_snapshot(out) == 2  # one atomic commit
    dec = decode_table(spark, out)
    assert dec.count() == docs.count()  # 0..499 exactly once
    assert (
        dec.groupBy("doc_id").count().where(F.col("count") > 1).count() == 0
    )
    assert (
        dec.where(F.col("doc_id") >= 200)
        .where(F.col("n_chars") < 1000).count() == 0
    )  # every matched/inserted row is the delta's version
    assert (
        dec.where(F.col("doc_id") < 200)
        .where(F.col("n_chars") >= 1000).count() == 0
    )  # untouched rows untouched
    assert decode_table(spark, out, snapshot=1).count() == 400


def test_apply_changes_mixed_batch_one_commit(spark, tmp_path):
    """SQL MERGE / CDC apply: updates, inserts (op synonym 'I') and
    deletes in ONE batch land as ONE snapshot commit; the final view
    equals the SQL reconstruction and time travel shows the pre-merge
    table."""
    from fhirflat_spark.decode import decode_table
    from fhirflat_spark.encode import apply_changes, encode_table
    from fhirflat_spark.manifest import current_snapshot

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "ds")
    encode_table(docs.where(F.col("doc_id") < 400), out, rows_per_bucket=500)
    batch = (
        docs.where(F.col("doc_id").between(100, 199))
        .withColumn("n_chars", F.col("n_chars") + 1000)
        .withColumn("_op", F.lit("update"))
        .unionByName(
            docs.where(F.col("doc_id").between(400, 449))
            .withColumn("_op", F.lit("I")))
        .unionByName(
            docs.where((F.col("doc_id") < 100)
                       & (F.col("doc_id") % 10 == 3))
            .withColumn("_op", F.lit("delete")))
    )
    info = apply_changes(batch, out, "doc_id", rows_per_bucket=500)
    assert info["inserts"] == 150 and info["deletes"] == 10
    assert info["snapshot"] == 2 and current_snapshot(out) == 2
    dec = decode_table(spark, out)
    exp = (
        docs.where(F.col("doc_id") < 450)
        .where((F.col("doc_id") >= 100) | (F.col("doc_id") % 10 != 3))
        .withColumn(
            "n_chars",
            F.when(F.col("doc_id").between(100, 199),
                   F.col("n_chars") + 1000).otherwise(F.col("n_chars")),
        )
    )
    assert dec.count() == exp.count()
    cols = dec.columns
    assert sorted(tuple(map(repr, r)) for r in dec.select(*cols).collect()) \
        == sorted(tuple(map(repr, r)) for r in exp.select(*cols).collect())
    assert decode_table(spark, out, snapshot=1).count() == 400


def test_apply_changes_pure_delete_empty_and_validation(spark, tmp_path):
    from fhirflat_spark.decode import decode_table
    from fhirflat_spark.encode import apply_changes, encode_table
    from fhirflat_spark.manifest import current_snapshot

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "ds")
    encode_table(docs.where(F.col("doc_id") < 200), out, rows_per_bucket=500)
    # pure-delete batch: one delete-only commit
    batch = docs.where(F.col("doc_id") < 20).withColumn("_op", F.lit("D"))
    info = apply_changes(batch, out, "doc_id")
    assert info == {"inserts": 0, "deletes": 20, "snapshot": 2}
    assert decode_table(spark, out).count() == 180
    # empty batch: no commit at all
    info = apply_changes(batch.limit(0), out, "doc_id")
    assert info == {"inserts": 0, "deletes": 0, "snapshot": 2}
    # validation: unknown op, duplicate key, NULL key, missing columns
    with pytest.raises(ValueError, match="unknown op"):
        apply_changes(
            docs.limit(1).withColumn("_op", F.lit("replace")), out, "doc_id")
    dup = docs.where(F.col("doc_id") == 250).withColumn("_op", F.lit("U"))
    with pytest.raises(ValueError, match="duplicate"):
        apply_changes(dup.unionByName(dup), out, "doc_id")
    with pytest.raises(ValueError, match="NULL"):
        apply_changes(
            docs.limit(1)
            .withColumn("doc_id", F.lit(None).cast("bigint"))
            .withColumn("_op", F.lit("U")), out, "doc_id")
    with pytest.raises(ValueError, match="in the batch"):
        apply_changes(docs.limit(1), out, "doc_id")
    assert current_snapshot(out) == 2  # failed validations committed nothing


def test_upsert_then_compact_materializes(spark, tmp_path):
    from fhirflat_spark.decode import compact_table, decode_table
    from fhirflat_spark.encode import encode_table, upsert_rows
    from fhirflat_spark.manifest import active_delete_files

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "ds")
    encode_table(docs.where(F.col("doc_id") < 300), out, rows_per_bucket=500)
    delta = docs.where(F.col("doc_id") < 100).withColumn(
        "lang", F.lit("xx")
    )
    upsert_rows(delta, out, "doc_id", rows_per_bucket=500)
    dst = str(tmp_path / "ds9")
    compact_table(spark, out, dst, rows_per_bucket=2000)
    assert active_delete_files(dst) == []
    dec = decode_table(spark, dst)
    assert dec.count() == 300
    assert dec.where(F.col("lang") == "xx").count() == 100


def test_delete_keys_as_dataframe(spark, tmp_path):
    """Large key sets go through the distributed writer (directory-form
    delete file), read back identically by the anti-join."""
    from fhirflat_spark.decode import decode_table
    from fhirflat_spark.encode import encode_table
    from fhirflat_spark.manifest import delete_rows

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "ds")
    encode_table(docs, out, rows_per_bucket=500)
    keys_df = docs.where(F.col("doc_id") % 3 == 0).select("doc_id")
    n_victims = keys_df.count()
    info = delete_rows(spark, out, "doc_id", keys_df)
    assert info["n_keys"] == n_victims
    dec = decode_table(spark, out)
    assert dec.count() == docs.count() - n_victims
    assert dec.where(F.col("doc_id") % 3 == 0).count() == 0


def test_fresh_encode_clears_previous_delete_files(spark, deleted):
    """Overwriting a dataset must not leave the previous table's delete
    files behind (a fresh table owns the whole directory)."""
    from fhirflat_spark.decode import decode_table
    from fhirflat_spark.encode import encode_table
    from fhirflat_spark.manifest import active_delete_files

    out, docs, _ = deleted
    encode_table(docs.limit(100), out, rows_per_bucket=500)
    assert active_delete_files(out) == []
    assert not os.path.isdir(f"{out}/deletes") or \
        os.listdir(f"{out}/deletes") == []
    assert decode_table(spark, out).count() == 100


def test_transcode_carries_active_deletes(spark, deleted, tmp_path):
    """transcode copies chunks verbatim (same part ids) — the source's
    active deletes must carry over, or deleted rows resurrect."""
    from fhirflat_spark.decode import decode_table, transcode_table
    from fhirflat_spark.manifest import active_delete_files

    out, docs, victims = deleted
    dst = str(tmp_path / "ds9")
    transcode_table(spark, out, dst, profile="archive")
    assert len(active_delete_files(dst)) == 1
    dec = decode_table(spark, dst)
    assert dec.count() == docs.count() - len(victims)
    assert dec.where(F.col("doc_id") % 7 == 0).count() == 0


def test_transcode_into_reused_dst_owns_the_directory(spark, deleted, tmp_path):
    """Re-running transcode into a dst that previously held a DELETED
    table must not leak the old table's snapshot/delete state into the
    new one."""
    from fhirflat_spark.decode import decode_table, transcode_table
    from fhirflat_spark.encode import encode_table
    from fhirflat_spark.manifest import current_snapshot

    out, docs, victims = deleted
    dst = str(tmp_path / "ds9")
    transcode_table(spark, out, dst, profile="archive")  # dst now has deletes
    # a different source, same dst
    src2 = str(tmp_path / "plain")
    encode_table(docs.limit(100), src2, rows_per_bucket=500)
    transcode_table(spark, src2, dst, profile="archive")
    assert current_snapshot(dst) == 1  # fresh history
    assert decode_table(spark, dst).count() == 100  # no stale anti-join


def test_delete_on_dotted_column_name(spark, tmp_path):
    """Flat datasets carry dotted column names (period.start): the
    delete anti-join must not resolve them as struct paths."""
    from fhirflat_spark.decode import decode_table
    from fhirflat_spark.encode import encode_table
    from fhirflat_spark.manifest import delete_rows

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(200)
        .withColumnRenamed("source", "meta.source")
    )
    out = str(tmp_path / "ds")
    encode_table(docs, out, rows_per_bucket=500)
    victim = docs.select("`meta.source`").first()[0]
    delete_rows(spark, out, "meta.source", [victim])
    dec = decode_table(spark, out)
    assert dec.where(F.col("`meta.source`") == victim).count() == 0
    assert dec.count() == docs.where(F.col("`meta.source`") != victim).count()
    # selective decode (widened key column) under a dotted name
    sel = decode_table(spark, out, columns=["doc_id"])
    assert sel.columns == ["doc_id"]
    assert sel.count() == dec.count()


def test_vacuum_reclaims_directory_form_delete_files(spark, tmp_path):
    """upsert writes its keys as a Spark directory — vacuum must reclaim
    those too once unreferenced."""
    from fhirflat_spark.encode import encode_table, upsert_rows
    from fhirflat_spark.manifest import (
        expire_snapshots,
        rollback,
        vacuum,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "ds")
    encode_table(docs.where(F.col("doc_id") < 300), out, rows_per_bucket=500)
    upsert_rows(docs.where(F.col("doc_id") < 100), out, "doc_id",
                rows_per_bucket=500)
    assert any(os.path.isdir(f"{out}/deletes/{n}")
               for n in os.listdir(f"{out}/deletes"))
    rollback(spark, out, 1)
    expire_snapshots(out, keep_last=1)
    vacuum(spark, out)
    assert os.listdir(f"{out}/deletes") == []
