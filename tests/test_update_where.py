"""Predicate UPDATE (maintenance.update_where) — UPDATE ... SET ...
WHERE as ONE snapshot commit: matched rows' new images append while
their old copies position-delete atomically; IO proportional to the
matched slice via zone pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fhirflat_spark.changes import table_changes
from fhirflat_spark.decode import decode_table
from fhirflat_spark.encode import encode_table
from fhirflat_spark.maintenance import update_where
from fhirflat_spark.manifest import current_snapshot, delete_rows

COLS = ["doc_id", "lang", "source", "n_chars"]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _decoded(spark, out, **kw):
    return _rows(decode_table(spark, out, **kw).select(*COLS))


@pytest.fixture()
def clustered(spark, tmp_path):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select(*COLS)
    out = str(tmp_path / "ds")
    ranged = docs.repartitionByRange(8, "n_chars").sortWithinPartitions(
        "n_chars"
    )
    encode_table(ranged, out, rows_per_bucket=2000, shuffle=False)
    return out, docs


def test_update_where_matches_sql_semantics(spark, clustered):
    out, docs = clustered
    pre = current_snapshot(out)
    pre_rows = _decoded(spark, out)
    rep = update_where(spark, out, ("n_chars", "lt", 200),
                       {"n_chars": "n_chars + 1000"},
                       rows_per_bucket=2000)
    assert rep["rows_updated"] > 0
    # zone pruning kept the scan off the high-n_chars partitions
    assert rep["parts_pruned"] > 0
    # exactly ONE new snapshot
    assert rep["snapshot"] == pre + 1 == current_snapshot(out)
    expect = docs.withColumn(
        "n_chars",
        F.when(F.col("n_chars") < 200, F.col("n_chars") + 1000)
        .otherwise(F.col("n_chars")),
    )
    assert _decoded(spark, out) == _rows(expect)
    # time travel: the pre-update snapshot is intact
    assert _decoded(spark, out, snapshot=pre) == pre_rows


def test_update_where_multi_set_cross_column(spark, clustered):
    out, docs = clustered
    update_where(spark, out, ("source", "eq", "web"),
                 {"source": "concat(lang, '-redacted')",
                  "n_chars": "0"},
                 rows_per_bucket=2000)
    hit = F.col("source") == "web"
    expect = docs.withColumn(
        "n_chars", F.when(hit, F.lit(0)).otherwise(F.col("n_chars"))
    ).withColumn(
        "source",
        F.when(hit, F.concat(F.col("lang"), F.lit("-redacted")))
        .otherwise(F.col("source")),
    )
    assert _decoded(spark, out) == _rows(expect)


def test_update_where_simultaneous_assignment(spark, tmp_path):
    """Every SET RHS must see the OLD row (SQL UPDATE): a two-column
    swap is the discriminating case — sequential assignment would copy
    one column into both."""
    df = spark.createDataFrame(
        [(i, i * 10, i * 100) for i in range(40)],
        "k int, a bigint, b bigint",
    )
    out = str(tmp_path / "ds")
    encode_table(df, out, rows_per_bucket=20)
    update_where(spark, out, ("k", "lt", 20), {"a": "b", "b": "a"})
    expect = sorted(
        (i, i * 100 if i < 20 else i * 10, i * 10 if i < 20 else i * 100)
        for i in range(40)
    )
    got = sorted(tuple(r) for r in
                 decode_table(spark, out).select("k", "a", "b").collect())
    assert got == expect


def test_update_where_null_rows_untouched(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, None if i % 3 == 0 else i * 10) for i in range(60)],
        "k int, v int",
    )
    out = str(tmp_path / "ds")
    encode_table(df, out, rows_per_bucket=20)
    update_where(spark, out, ("v", "lt", 300), {"v": "v + 1"})
    expect = df.withColumn(
        "v", F.when(F.col("v") < 300, F.col("v") + 1).otherwise(F.col("v"))
    )
    got = sorted(tuple(r) for r in
                 decode_table(spark, out).select("k", "v").collect())
    assert got == sorted(tuple(r) for r in expect.collect())


def test_update_where_no_match_no_commit(spark, clustered):
    out, _ = clustered
    pre = current_snapshot(out)
    rep = update_where(spark, out, ("n_chars", "gt", 10_000),
                       {"n_chars": "0"})
    assert rep["snapshot"] is None and rep["rows_updated"] == 0
    assert current_snapshot(out) == pre


def test_update_where_composes_with_equality_delete(spark, clustered):
    out, docs = clustered
    delete_rows(spark, out, "doc_id", [1, 2, 3])
    rep = update_where(spark, out, ("n_chars", "lt", 200),
                       {"n_chars": "n_chars + 1000"}, rows_per_bucket=2000)
    assert rep["rows_updated"] > 0
    expect = docs.where(~F.col("doc_id").isin(1, 2, 3)).withColumn(
        "n_chars",
        F.when(F.col("n_chars") < 200, F.col("n_chars") + 1000)
        .otherwise(F.col("n_chars")),
    )
    assert _decoded(spark, out) == _rows(expect)


def test_update_where_crash_before_commit_retries_clean(
    spark, clustered, monkeypatch
):
    """A crash after the chunk write but before the manifest commit
    leaves the table logically UNCHANGED (decode trusts the manifest,
    not the chunks/ listing); the retry reuses the same part offset and
    positions file (offset-keyed), so the final state has no duplicate
    images and no leaked deletes."""
    import fhirflat_spark.manifest as mf

    out, docs = clustered
    pre = current_snapshot(out)
    pre_rows = _decoded(spark, out)

    real = mf.write_manifest
    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash before commit")
        return real(*a, **k)

    monkeypatch.setattr(mf, "write_manifest", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        update_where(spark, out, ("n_chars", "lt", 200),
                     {"n_chars": "n_chars + 1000"}, rows_per_bucket=2000)
    # nothing committed: readers see the pre state
    assert current_snapshot(out) == pre
    assert _decoded(spark, out) == pre_rows
    # retry converges to exactly one update per matched row
    rep = update_where(spark, out, ("n_chars", "lt", 200),
                       {"n_chars": "n_chars + 1000"}, rows_per_bucket=2000)
    assert rep["rows_updated"] > 0
    expect = docs.withColumn(
        "n_chars",
        F.when(F.col("n_chars") < 200, F.col("n_chars") + 1000)
        .otherwise(F.col("n_chars")),
    )
    assert _decoded(spark, out) == _rows(expect)


def test_update_where_cdf_fast_path_balances(spark, clustered):
    """The update window is append-only (parts grow + one positional
    entry): the batch CDF must report exactly n deletes (old images)
    and n inserts (new images)."""
    out, _ = clustered
    pre = current_snapshot(out)
    rep = update_where(spark, out, ("n_chars", "lt", 200),
                       {"n_chars": "n_chars + 1000"}, rows_per_bucket=2000)
    n = rep["rows_updated"]
    ch = table_changes(spark, out, pre, current_snapshot(out))
    counts = {r["_change_type"]: r["n"] for r in
              ch.groupBy("_change_type").agg(F.count("*").alias("n"))
              .collect()}
    assert counts == {"delete": n, "insert": n}
