"""Optimistic concurrency on snapshot commits: the versioned manifest is
CREATED exclusively (fsio.write_bytes_exclusive — one winner per version),
data commits surface CommitConflictError instead of silently erasing a
racing writer's snapshot, metadata-only commits (delete_rows, rollback)
auto-retry, and the advisory current-manifest copy self-heals if its
writes raced a newer committer."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from fhirflat_spark import fsio
from fhirflat_spark.manifest import (
    CommitConflictError,
    _advance_current,
    active_delete_files,
    current_snapshot,
    read_snapshot_manifest,
    snapshot_manifest_path,
)


@pytest.fixture()
def ds(spark, tmp_path):
    from fhirflat_spark.encode import encode_table

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "ds")
    encode_table(docs, out, rows_per_bucket=500)
    return out, docs


def test_write_bytes_exclusive_local(tmp_path):
    p = str(tmp_path / "x.txt")
    fsio.write_bytes_exclusive(p, b"winner")
    with pytest.raises(FileExistsError):
        fsio.write_bytes_exclusive(p, b"loser")
    assert fsio.read_bytes(p) == b"winner"
    # the loser's tmp file must not linger (a leaked .xtmp would make
    # list_files-driven maintenance see phantom entries)
    assert fsio.list_files(str(tmp_path)) == ["x.txt"]


def test_write_bytes_exclusive_registered_scheme(tmp_path):
    from pyarrow import fs as pafs

    fsio.register_filesystem(
        "mem", pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())
    )
    try:
        fsio.write_bytes_exclusive("mem://a/b.txt", b"one")
        with pytest.raises(FileExistsError):
            fsio.write_bytes_exclusive("mem://a/b.txt", b"two")
        assert fsio.read_bytes("mem://a/b.txt") == b"one"
    finally:
        fsio.register_filesystem("mem", None)


def test_data_commit_conflict_raises_and_preserves_winner(
    spark, ds, monkeypatch
):
    """A writer whose snapshot read went stale (a concurrent committer
    won its version) must raise CommitConflictError and leave the
    winner's snapshot untouched — never overwrite it."""
    import fhirflat_spark.manifest as mf
    from fhirflat_spark.encode import append_table

    out, docs = ds
    assert current_snapshot(out) == 1
    winner = read_snapshot_manifest(out, 1)
    # simulate: this append's commit minted v1 from a stale listing
    # while v1 already exists on disk (version minting reads the
    # listing, so staleness is injected at _next_version)
    monkeypatch.setattr(mf, "_next_version", lambda d: 1)
    with pytest.raises(CommitConflictError):
        append_table(docs.limit(50), out, rows_per_bucket=500)
    monkeypatch.undo()
    assert read_snapshot_manifest(out, 1).equals(winner)


def test_concurrent_deletes_all_commit(spark, ds):
    """N threads issuing row-level deletes against the same table race
    on version minting; auto-retry must land every one as its own
    snapshot with the full delete set active."""
    out, docs = ds
    from fhirflat_spark.decode import decode_table
    from fhirflat_spark.manifest import delete_rows

    ids = [r.doc_id for r in docs.select("doc_id").limit(4).collect()]
    errs: list[Exception] = []
    barrier = threading.Barrier(len(ids))

    def run(v):
        try:
            barrier.wait(timeout=60)
            delete_rows(spark, out, "doc_id", [v])
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    ts = [threading.Thread(target=run, args=(v,)) for v in ids]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    assert current_snapshot(out) == 1 + len(ids)
    active = active_delete_files(out)
    assert len(active) == len(ids)
    # every commit kept its own keys file — a shared/overwritten name
    # would alias two deletes to one key set
    assert len({e["file"] for e in active}) == len(ids)
    got = {r.doc_id for r in decode_table(spark, out).select("doc_id").collect()}
    assert got == {r.doc_id for r in docs.select("doc_id").collect()} - set(ids)


def test_advance_current_self_heals_regression(spark, ds):
    """Re-publishing an OLD version through _advance_current (the racy
    current-copy write) must detect the newer committed snapshot and
    leave the copy + hint at the newest version."""
    out, docs = ds
    from fhirflat_spark.encode import append_table

    append_table(docs.limit(100), out, rows_per_bucket=500)
    assert current_snapshot(out) == 2
    newest = read_snapshot_manifest(out, 2)
    _advance_current(out, 1, read_snapshot_manifest(out, 1), token="t")
    assert fsio.read_bytes(
        f"{out}/snapshots/version-hint.txt"
    ).decode().strip() == "2"
    assert fsio.read_parquet(f"{out}/manifest/manifest.parquet").equals(newest)


def test_exclusive_snapshot_create_is_the_gate(ds):
    """The versioned manifest path itself refuses a second creation —
    the CAS every commit site goes through."""
    out, _ = ds
    p = snapshot_manifest_path(out, 1)
    with pytest.raises(FileExistsError):
        fsio.write_bytes_exclusive(p, b"imposter")
