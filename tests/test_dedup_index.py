"""Incremental MinHash dedup index: refresh ≡ rebuild, delete pruning,
frontier-only pair reporting (dedup_index.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fhirflat_spark.dedup_index import (
    build_dedup_index,
    new_duplicate_pairs,
    read_dedup_index,
    refresh_dedup_index,
)


@pytest.fixture()
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_refresh_equals_rebuild(spark, docs, tmp_path):
    from fhirflat_spark.encode import append_table, encode_table

    out, idx, idx2 = (str(tmp_path / n) for n in ("ds", "idx", "idx2"))
    encode_table(docs.where(F.col("doc_id") % 2 == 0), out,
                 rows_per_bucket=2000)
    build_dedup_index(spark, out, idx)
    append_table(docs.where(F.col("doc_id") % 2 == 1), out,
                 rows_per_bucket=2000)
    meta = refresh_dedup_index(spark, out, idx)
    assert meta["snapshot"] == 2
    # the headline invariant: incremental == from-scratch, signature-exact
    build_dedup_index(spark, out, idx2)
    incr = read_dedup_index(spark, idx).drop("batch_snapshot")
    full = read_dedup_index(spark, idx2).drop("batch_snapshot")
    assert _rows(incr) == _rows(full)
    # no-op refresh
    assert refresh_dedup_index(spark, out, idx)["snapshot"] == 2


def test_refresh_drops_deleted_keys(spark, docs, tmp_path):
    from fhirflat_spark.encode import encode_table
    from fhirflat_spark.manifest import delete_rows

    out, idx = str(tmp_path / "ds"), str(tmp_path / "idx")
    encode_table(docs, out, rows_per_bucket=2000)
    build_dedup_index(spark, out, idx)
    gone = [r.doc_id for r in docs.limit(5).collect()]
    delete_rows(spark, out, "doc_id", gone)
    refresh_dedup_index(spark, out, idx)
    left = read_dedup_index(spark, idx)
    assert left.where(F.col("doc_id").isin(gone)).count() == 0
    assert left.count() == docs.count() - len(gone)


def test_new_pairs_touch_only_the_frontier(spark, tmp_path):
    from fhirflat_spark.encode import append_table, encode_table

    out, idx = str(tmp_path / "ds"), str(tmp_path / "idx")
    base = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),  # old-old duplicate
            (3, "one two three four five six seven"),
        ],
        "doc_id bigint, text string",
    )
    encode_table(base, out, rows_per_bucket=100)
    build_dedup_index(spark, out, idx)
    # at build time everything is the frontier: the old-old pair shows
    first = {(r.doc_a, r.doc_b) for r in new_duplicate_pairs(spark, idx).collect()}
    assert (1, 2) in first
    delta = spark.createDataFrame(
        [
            (10, "one two three four five six seven"),  # dup of OLD doc 3
            (11, "totally novel content nothing shared"),
        ],
        "doc_id bigint, text string",
    )
    append_table(delta, out, rows_per_bucket=100)
    refresh_dedup_index(spark, out, idx)
    pairs = {(r.doc_a, r.doc_b) for r in new_duplicate_pairs(spark, idx).collect()}
    assert (3, 10) in pairs          # new-vs-old duplicate found
    assert (1, 2) not in pairs       # old-vs-old NOT re-reported
    assert all(10 in p or 11 in p for p in pairs), pairs


def test_pair_plan_no_cartesian_no_python(spark, docs, tmp_path):
    from fhirflat_spark.encode import encode_table

    out, idx = str(tmp_path / "ds"), str(tmp_path / "idx")
    encode_table(docs, out, rows_per_bucket=2000)
    build_dedup_index(spark, out, idx)
    plan = (
        new_duplicate_pairs(spark, idx)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_refresh_after_compaction_reset_rebuilds(spark, docs, tmp_path):
    """A compaction swap renumbers snapshots (the new lineage starts at
    v1 < the index's pinned version): refresh must detect the reset and
    rebuild rather than mis-read the new history as a delta. Signatures
    stay equal (same logical rows); provenance restarts at the new v1."""
    from fhirflat_spark.decode import compact_table
    from fhirflat_spark.encode import append_table, encode_table

    out, dst, idx = (str(tmp_path / n) for n in ("ds", "compacted", "idx"))
    encode_table(docs.where(F.col("doc_id") % 2 == 0), out,
                 rows_per_bucket=1000)
    append_table(docs.where(F.col("doc_id") % 2 == 1), out,
                 rows_per_bucket=1000)
    build_dedup_index(spark, out, idx)   # pinned at snapshot 2
    before = _rows(read_dedup_index(spark, idx).drop("batch_snapshot"))
    compact_table(spark, out, dst, rows_per_bucket=4000)
    meta = refresh_dedup_index(spark, dst, idx)  # caller swapped dirs
    assert meta["snapshot"] == 1  # rebuilt against the reset lineage
    after = read_dedup_index(spark, idx)
    assert _rows(after.drop("batch_snapshot")) == before
    assert after.where(F.col("batch_snapshot") != 1).count() == 0


def test_refresh_detects_reset_past_pinned_version(spark, docs, tmp_path):
    """The subtler reset: the new lineage ADVANCES PAST the pinned
    version, so the (frm, to] window looks like a plausible delta of
    the wrong history. The pinned snapshot's content sha disambiguates:
    refresh must rebuild, landing signature-equal to a from-scratch
    index of the new table."""
    from fhirflat_spark.encode import append_table, encode_table

    out, idx, idx2 = (str(tmp_path / n) for n in ("ds", "idx", "idx2"))
    encode_table(docs.where(F.col("doc_id") < 200), out,
                 rows_per_bucket=1000)
    append_table(docs.where(F.col("doc_id").between(200, 299)), out,
                 rows_per_bucket=1000)
    build_dedup_index(spark, out, idx)  # pinned at snapshot 2
    # history RESET: fresh re-encode of DIFFERENT rows, then appends
    # push the new lineage past the pinned version (v3 > 2)
    encode_table(docs.where(F.col("doc_id") >= 300), out,
                 rows_per_bucket=1000)
    append_table(docs.where(F.col("doc_id").between(100, 149)), out,
                 rows_per_bucket=1000)
    append_table(docs.where(F.col("doc_id").between(150, 199)), out,
                 rows_per_bucket=1000)
    meta = refresh_dedup_index(spark, out, idx)
    assert meta["snapshot"] == 3
    build_dedup_index(spark, out, idx2)
    assert _rows(read_dedup_index(spark, idx).drop("batch_snapshot")) == \
        _rows(read_dedup_index(spark, idx2).drop("batch_snapshot"))
