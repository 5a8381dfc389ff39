"""Predicate DELETE (maintenance.delete_where) — the Iceberg
``DELETE FROM t WHERE ...`` analog: metadata-only drops for partitions
whose zone/null rollups entail the predicate, one positional-delete
entry for straddlers, ONE snapshot commit, time travel intact."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fhirflat_spark.changes import table_changes
from fhirflat_spark.decode import decode_table
from fhirflat_spark.encode import append_table, encode_table
from fhirflat_spark.maintenance import delete_where
from fhirflat_spark.manifest import current_snapshot, delete_rows

COLS = ["doc_id", "lang", "source", "n_chars"]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _decoded(spark, out, **kw):
    return _rows(decode_table(spark, out, **kw).select(*COLS))


@pytest.fixture()
def clustered(spark, tmp_path):
    """n_chars-range-clustered dataset: zone entailment can prove whole
    partitions match a n_chars predicate."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select(*COLS)
    out = str(tmp_path / "ds")
    ranged = docs.repartitionByRange(8, "n_chars").sortWithinPartitions(
        "n_chars"
    )
    encode_table(ranged, out, rows_per_bucket=2000, shuffle=False)
    return out, docs


def test_delete_where_drops_scans_and_matches_filter(spark, clustered):
    out, docs = clustered
    pre_snap = current_snapshot(out)
    pre_rows = _decoded(spark, out)
    rep = delete_where(spark, out, ("n_chars", "lt", 200))
    # the clustered layout must exercise BOTH tiers
    assert rep["parts_dropped"], rep
    assert rep["n_positions"] > 0, rep
    # exactly ONE new snapshot
    assert rep["snapshot"] == pre_snap + 1
    assert current_snapshot(out) == pre_snap + 1
    # survivors = SQL DELETE semantics (pred true → gone)
    assert _decoded(spark, out) == _rows(
        docs.where(~(F.col("n_chars") < 200))
    )
    # time travel: the pre-delete snapshot still sees every row
    assert _decoded(spark, out, snapshot=pre_snap) == pre_rows


def test_delete_where_metadata_only_when_fully_entailed(
    spark, tmp_path, monkeypatch
):
    """A predicate the zones fully entail never touches data bytes:
    decode_table must not be called at all."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select(*COLS)
    out = str(tmp_path / "ds")
    encode_table(docs.where(F.col("doc_id") < 250), out,
                 rows_per_bucket=2000)
    append_table(docs.where(F.col("doc_id") >= 250), out,
                 rows_per_bucket=2000)

    import fhirflat_spark.decode as dec

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("metadata-only delete decoded data")

    monkeypatch.setattr(dec, "decode_table", boom)
    rep = delete_where(spark, out, ("doc_id", "ge", 250))
    monkeypatch.undo()
    assert rep["parts_dropped"] and not rep["parts_scanned"]
    assert rep["n_positions"] == 0
    assert _decoded(spark, out) == _rows(docs.where(F.col("doc_id") < 250))


def test_delete_where_null_semantics(spark, tmp_path):
    """NULL rows never match a value predicate (SQL DELETE); the 'nu'
    op deletes exactly the NULL rows."""
    df = spark.createDataFrame(
        [(i, None if i % 3 == 0 else i * 10) for i in range(60)],
        "k int, v int",
    )
    out = str(tmp_path / "ds")
    encode_table(df, out, rows_per_bucket=20)
    delete_where(spark, out, ("v", "lt", 300))
    expect = df.where(~(F.col("v") < 300) | F.col("v").isNull())
    got = sorted(tuple(r) for r in
                 decode_table(spark, out).select("k", "v").collect())
    assert got == sorted(tuple(r) for r in expect.collect())
    rep = delete_where(spark, out, ("v", "nu"))
    assert rep["snapshot"] is not None
    got = sorted(tuple(r) for r in
                 decode_table(spark, out).select("k", "v").collect())
    assert got == sorted(
        tuple(r) for r in expect.where(F.col("v").isNotNull()).collect()
    )


def test_delete_where_no_match_no_commit(spark, clustered):
    out, _ = clustered
    pre = current_snapshot(out)
    rep = delete_where(spark, out, ("n_chars", "gt", 10_000))
    assert rep["snapshot"] is None
    assert rep["parts_dropped"] == [] and rep["n_positions"] == 0
    assert current_snapshot(out) == pre


def test_delete_where_dry_run_commits_nothing(spark, clustered):
    out, _ = clustered
    pre = current_snapshot(out)
    rep = delete_where(spark, out, ("n_chars", "lt", 200), dry_run=True)
    assert rep["would_commit"] is True
    assert rep["parts_dropped"] and rep["snapshot"] is None
    assert current_snapshot(out) == pre


def test_delete_where_conjunction_matches_spark_filter(spark, clustered):
    out, docs = clustered
    preds = [("n_chars", "ge", 300), ("source", "eq", "web")]
    delete_where(spark, out, preds)
    keep = ~((F.col("n_chars") >= 300) & (F.col("source") == "web"))
    assert _decoded(spark, out) == _rows(docs.where(keep))


def test_delete_where_composes_with_equality_delete(spark, clustered):
    out, docs = clustered
    delete_rows(spark, out, "doc_id", [1, 2, 3])
    delete_where(spark, out, ("n_chars", "lt", 200))
    keep = (~F.col("doc_id").isin(1, 2, 3)) & ~(F.col("n_chars") < 200)
    assert _decoded(spark, out) == _rows(docs.where(keep))


def test_delete_where_truncate_all(spark, clustered):
    out, _ = clustered
    rep = delete_where(spark, out, ("n_chars", "ge", 0))
    assert rep["snapshot"] is not None
    assert decode_table(spark, out).count() == 0


def test_delete_where_cdf_diffs_views(spark, clustered):
    """A window containing a partition drop is not append-only —
    table_changes must fall back to the view diff and reconstruct the
    post state from the pre state."""
    out, _ = clustered
    pre = current_snapshot(out)
    pre_view = decode_table(spark, out).select(*COLS)
    delete_where(spark, out, ("n_chars", "lt", 200))
    post = current_snapshot(out)
    ch = table_changes(spark, out, pre, post)
    deletes = ch.where(F.col("_change_type") == "delete").select(*COLS)
    inserts = ch.where(F.col("_change_type") == "insert").select(*COLS)
    rebuilt = pre_view.exceptAll(deletes).unionByName(inserts)
    assert _rows(rebuilt) == _decoded(spark, out)
