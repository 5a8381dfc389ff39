"""Write-audit-publish branches (Iceberg WAP analog): staged commits
invisible to main, audit via snapshot=branch, fast-forward publish,
divergence refusal, drop cleanup, and recovery never adopting staged
snapshots."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fhirflat_spark.decode import decode_table, verify_table
from fhirflat_spark.encode import append_table, encode_table
from fhirflat_spark.manifest import (
    CommitConflictError,
    _read_refs_full,
    create_tag,
    current_snapshot,
    delete_rows,
    drop_branch,
    drop_tag,
    list_refs,
    publish_branch,
    read_summary,
    snapshot_parent,
    vacuum,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture()
def base(spark, docs, tmp_path):
    out = str(tmp_path / "ds")
    encode_table(docs.where(F.col("doc_id") < 100), out, rows_per_bucket=50)
    return out


def test_stage_is_invisible_to_main(spark, docs, base):
    append_table(docs.where(F.col("doc_id").between(100, 149)), base,
                 rows_per_bucket=50, branch="audit")
    assert current_snapshot(base) == 1
    assert decode_table(spark, base).count() == 100
    assert decode_table(spark, base, snapshot="audit").count() == 150
    # summary stays at the main state while staged
    assert read_summary(spark, base)["rows"] == 100
    # parent lineage recorded
    assert snapshot_parent(base, 2) == 1


def test_main_data_commit_refused_while_staged(spark, docs, base):
    append_table(docs.where(F.col("doc_id").between(100, 149)), base,
                 rows_per_bucket=50, branch="audit")
    with pytest.raises(ValueError, match="unpublished staged commits"):
        append_table(docs.where(F.col("doc_id") == 999), base,
                     rows_per_bucket=50)


def test_publish_fast_forwards_pointer_and_summary(spark, docs, base):
    append_table(docs.where(F.col("doc_id").between(100, 149)), base,
                 rows_per_bucket=50, branch="audit")
    v = publish_branch(base, "audit")
    assert current_snapshot(base) == v
    assert decode_table(spark, base).count() == 150
    s = read_summary(spark, base)
    assert s["rows"] == 150
    # published table verifies end-to-end (chunk checksums intact)
    assert verify_table(spark, base).where(~F.col("ok")).count() == 0
    # branch ref survives publish with an empty staging cycle
    refs = _read_refs_full(base)
    assert refs["audit"]["history"] == [] and refs["audit"]["snapshot"] == v


def test_multi_commit_staging_cycle(spark, docs, base):
    append_table(docs.where(F.col("doc_id").between(100, 129)), base,
                 rows_per_bucket=50, branch="audit")
    append_table(docs.where(F.col("doc_id").between(130, 149)), base,
                 rows_per_bucket=50, branch="audit")
    assert decode_table(spark, base).count() == 100
    assert decode_table(spark, base, snapshot="audit").count() == 150
    assert _read_refs_full(base)["audit"]["history"] == [2, 3]
    publish_branch(base, "audit")
    assert decode_table(spark, base).count() == 150


def test_publish_refuses_after_main_moved(spark, docs, base):
    append_table(docs.where(F.col("doc_id").between(100, 149)), base,
                 rows_per_bucket=50, branch="audit")
    # metadata-only commit on main is allowed and moves the head
    delete_rows(spark, base, "doc_id", [0])
    with pytest.raises(CommitConflictError, match="fast-forward"):
        publish_branch(base, "audit")
    # the staged work is still auditable and can be dropped cleanly
    assert decode_table(spark, base, snapshot="audit").count() == 150
    drop_branch(base, "audit")
    assert decode_table(spark, base).count() == 99


def test_drop_branch_cleans_everything(spark, docs, base):
    append_table(docs.where(F.col("doc_id").between(100, 149)), base,
                 rows_per_bucket=50, branch="audit")
    dropped = drop_branch(base, "audit")
    assert dropped == [2]
    assert "audit" not in list_refs(base)
    assert current_snapshot(base) == 1
    # staged-only chunk partitions are unreferenced → reclaimable
    assert vacuum(spark, base)
    # fragments cleaned: the next MAIN append must not resurrect staged rows
    append_table(docs.where(F.col("doc_id").between(200, 209)), base,
                 rows_per_bucket=50)
    assert decode_table(spark, base).count() == 110


def test_recovery_never_adopts_staged_snapshots(spark, docs, base):
    """Deleting the version hint simulates a torn pointer: recovery must
    re-adopt the MAIN head, not the staged branch head above it."""
    from fhirflat_spark import fsio

    append_table(docs.where(F.col("doc_id").between(100, 149)), base,
                 rows_per_bucket=50, branch="audit")
    fsio.delete_file(f"{base}/snapshots/version-hint.txt")
    assert current_snapshot(base) == 1
    assert decode_table(spark, base).count() == 100


def test_branch_guards(spark, docs, base):
    append_table(docs.where(F.col("doc_id").between(100, 149)), base,
                 rows_per_bucket=50, branch="audit")
    # tag/branch namespace is shared
    with pytest.raises(ValueError, match="is a branch"):
        create_tag(base, "audit")
    with pytest.raises(ValueError, match="staged branch"):
        drop_tag(base, "audit")
    # staged schema evolution must not leak columns to main readers
    with pytest.raises(ValueError, match="schema evolution"):
        append_table(
            docs.where(F.col("doc_id") == 150).withColumn(
                "extra", F.lit(1)), base, rows_per_bucket=50, branch="audit",
        )
    # fresh encode can't stage
    with pytest.raises(ValueError, match="append-only"):
        encode_table(docs.limit(1), base + "2", branch="b")
    with pytest.raises(ValueError, match="no staged branch"):
        publish_branch(base, "nope")


def test_named_source_reads_branch_snapshot(spark, docs, base):
    from fhirflat_spark.sources.datasource import register

    append_table(docs.where(F.col("doc_id").between(100, 149)), base,
                 rows_per_bucket=50, branch="audit")
    register(spark)
    via = (
        spark.read.format("fhirflat").option("path", base)
        .option("snapshot", "audit").load()
    )
    assert via.count() == 150
    main = spark.read.format("fhirflat").option("path", base).load()
    assert main.count() == 100


def test_verify_table_scopes_to_branch_snapshot(spark, docs, base):
    """The audit step: verify_table(snapshot=branch) checksums exactly
    the staged table's chunks (main-scoped verify excludes staged
    partitions; branch-scoped covers them)."""
    append_table(docs.where(F.col("doc_id").between(100, 149)), base,
                 rows_per_bucket=50, branch="audit")
    main_v = verify_table(spark, base, snapshot=1)
    branch_v = verify_table(spark, base, snapshot="audit")
    assert main_v.where(~F.col("ok")).count() == 0
    assert branch_v.where(~F.col("ok")).count() == 0
    assert branch_v.count() > main_v.count()


def test_table_changes_accepts_ref_names(spark, docs, base):
    """Audit change review: diff main head against the staged branch by
    NAME — exactly the staged rows appear as inserts."""
    from fhirflat_spark.changes import table_changes
    from fhirflat_spark.manifest import create_tag

    append_table(docs.where(F.col("doc_id").between(100, 149)), base,
                 rows_per_bucket=50, branch="audit")
    create_tag(base, "baseline", 1)
    ch = table_changes(spark, base, "baseline", "audit").collect()
    assert len(ch) == 50
    assert all(r["_change_type"] == "insert" for r in ch)
    assert sorted(r["doc_id"] for r in ch) == list(range(100, 150))


def test_expire_keeps_main_window_despite_staged_tail(spark, docs, base):
    """keep_last counts MAIN snapshots: staged branch versions at the
    top of the listing must not crowd recent main history out of the
    retention window."""
    from fhirflat_spark.manifest import expire_snapshots

    append_table(docs.where(F.col("doc_id").between(100, 119)), base,
                 rows_per_bucket=50)  # main v2
    append_table(docs.where(F.col("doc_id").between(120, 149)), base,
                 rows_per_bucket=50, branch="audit")  # staged v3
    expired = expire_snapshots(base, keep_last=2)
    # main window = {1, 2}; the staged v3 is protected; nothing expires
    assert expired == []
    expired = expire_snapshots(base, keep_last=1)
    assert expired == [1]
    # branch still auditable and publishable afterwards
    assert decode_table(spark, base, snapshot="audit").count() == 150
    publish_branch(base, "audit")
    assert decode_table(spark, base).count() == 150


def test_crashed_staged_commit_never_becomes_main(spark, docs, base,
                                                  monkeypatch):
    """Crash window: the staged snapshot is written but the branch ref
    update never happens. Recovery (even with a torn hint) must not
    adopt the orphan — staged snapshots self-identify via their
    manifest marker."""
    import fhirflat_spark.manifest as mf
    from fhirflat_spark import fsio

    monkeypatch.setattr(mf, "_write_refs_full",
                        lambda *a, **k: (_ for _ in ()).throw(
                            RuntimeError("crash before refs update")))
    with pytest.raises(RuntimeError, match="crash before refs"):
        append_table(docs.where(F.col("doc_id").between(100, 149)), base,
                     rows_per_bucket=50, branch="audit")
    monkeypatch.undo()
    # the orphan staged snapshot exists on disk but main stays at v1,
    # even after the hint is lost
    fsio.delete_file(f"{base}/snapshots/version-hint.txt")
    assert current_snapshot(base) == 1
    assert decode_table(spark, base).count() == 100


def test_published_head_survives_lost_hint(spark, docs, base):
    """After publish the staged marker is stripped, so recovery from a
    lost hint lands on the published head, not its base."""
    from fhirflat_spark import fsio

    append_table(docs.where(F.col("doc_id").between(100, 149)), base,
                 rows_per_bucket=50, branch="audit")
    publish_branch(base, "audit")
    fsio.delete_file(f"{base}/snapshots/version-hint.txt")
    assert current_snapshot(base) == 2
    assert decode_table(spark, base).count() == 150
