"""Stats backfill (maintenance.analyze_table) — the Iceberg ANALYZE /
compute-table-stats analog: NDV + quantile sketches land on legacy
partitions via one metadata-only commit, bit-identical to encode-time
opt-in, with no chunk rewritten."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from fhirflat_spark import fsio
from fhirflat_spark.encode import append_table, encode_table
from fhirflat_spark.maintenance import analyze_table
from fhirflat_spark.manifest import current_snapshot, delete_rows
from fhirflat_spark.ndv import ndv_from_metadata
from fhirflat_spark.quantiles import quantile_from_metadata

DOCS = "/root/testdata/sf0.001/documents.parquet"
COLS = ["doc_id", "lang", "source", "n_chars"]


def _docs(spark):
    return spark.read.parquet(DOCS).select(*COLS)


def _stats_cols(out):
    t = fsio.read_parquet(f"{out}/manifest",
                          columns=["part_id", "col_hlls", "col_ddqs"])
    return {
        int(p): (h, d) for p, h, d in zip(
            t["part_id"].to_pylist(), t["col_hlls"].to_pylist(),
            t["col_ddqs"].to_pylist(),
        )
    }


def test_analyze_bit_identical_to_encode_time_optin(spark, tmp_path):
    """The backfilled sketch must be the EXACT bytes encode-time opt-in
    produces: both are pure functions of the value multiset, and the
    layouts are deterministic, so the manifests must agree cell by
    cell."""
    docs = _docs(spark)
    plain = str(tmp_path / "plain")
    optin = str(tmp_path / "optin")
    encode_table(docs, plain, rows_per_bucket=2000)
    encode_table(docs, optin, rows_per_bucket=2000,
                 ndv_columns=["lang", "doc_id"],
                 quantile_columns=["n_chars"])
    rep = analyze_table(spark, plain, ndv_columns=["lang", "doc_id"],
                        quantile_columns=["n_chars"])
    assert rep["snapshot"] == 2 and rep["parts_updated"]
    assert rep["chunks_scanned"] > 0
    assert _stats_cols(plain) == _stats_cols(optin)


def test_analyze_enables_metadata_readers(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "ds")
    encode_table(docs, out, rows_per_bucket=2000)
    assert ndv_from_metadata(out, "lang") is None
    assert quantile_from_metadata(out, "n_chars", 0.5) is None
    analyze_table(spark, out, ndv_columns=["lang"],
                  quantile_columns=["n_chars"])
    exact = docs.select("lang").distinct().count()
    est = ndv_from_metadata(out, "lang")
    assert est is not None and abs(est - exact) <= max(1, 0.05 * exact)
    med = quantile_from_metadata(out, "n_chars", 0.5)
    ranked = sorted(r[0] for r in docs.select("n_chars").collect())
    truth = ranked[int(0.5 * (len(ranked) - 1))]
    assert med is not None and abs(med - truth) <= 0.02 * abs(truth) + 1e-9
    # the pre-analyze snapshot still has no stats (time travel honest)
    assert ndv_from_metadata(out, "lang", snapshot=1) is None


def test_analyze_adds_column_without_touching_existing(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "ds")
    encode_table(docs, out, rows_per_bucket=2000, ndv_columns=["lang"])
    before = {p: json.loads(h)["lang"]
              for p, (h, _) in _stats_cols(out).items() if h}
    analyze_table(spark, out, ndv_columns=["doc_id"])
    after = _stats_cols(out)
    for p, lang_hex in before.items():
        got = json.loads(after[p][0])
        assert got["lang"] == lang_hex  # untouched
        assert "doc_id" in got  # backfilled
    assert ndv_from_metadata(out, "doc_id") is not None


def test_analyze_noop_when_complete(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "ds")
    encode_table(docs, out, rows_per_bucket=2000, ndv_columns=["lang"])
    pre = current_snapshot(out)
    rep = analyze_table(spark, out, ndv_columns=["lang"])
    assert rep["snapshot"] is None and rep["chunks_scanned"] == 0
    assert current_snapshot(out) == pre


def test_analyze_refuses_active_deletes(spark, tmp_path):
    docs = _docs(spark)
    out = str(tmp_path / "ds")
    encode_table(docs, out, rows_per_bucket=2000)
    delete_rows(spark, out, "doc_id", [1, 2])
    with pytest.raises(ValueError, match="active row-level deletes"):
        analyze_table(spark, out, ndv_columns=["lang"])


def test_appends_after_analyze_inherit_sketching(spark, tmp_path):
    """The summary's tracked-column lists extend at analyze time, so a
    later append sketches its new chunks and the table estimate stays
    servable over mixed history."""
    docs = _docs(spark)
    out = str(tmp_path / "ds")
    encode_table(docs.where(F.col("doc_id") < 250), out,
                 rows_per_bucket=2000)
    analyze_table(spark, out, ndv_columns=["lang"],
                  quantile_columns=["n_chars"])
    append_table(docs.where(F.col("doc_id") >= 250), out,
                 rows_per_bucket=2000)
    exact = docs.select("lang").distinct().count()
    est = ndv_from_metadata(out, "lang")
    assert est is not None and abs(est - exact) <= max(1, 0.05 * exact)
    assert quantile_from_metadata(out, "n_chars", 0.9) is not None


def test_analyze_window_is_empty_cdf(spark, tmp_path):
    from fhirflat_spark.changes import table_changes

    docs = _docs(spark)
    out = str(tmp_path / "ds")
    encode_table(docs, out, rows_per_bucket=2000)
    pre = current_snapshot(out)
    analyze_table(spark, out, ndv_columns=["lang"])
    assert table_changes(spark, out, pre, current_snapshot(out)).count() == 0


def test_analyze_all_null_column_explained(spark, tmp_path):
    """An all-NULL sketched column serves the exact answer (0/NULL-side
    semantics) via the nulls rollup, not a missing-sketch refusal."""
    df = spark.createDataFrame(
        [(i, None) for i in range(100)], "k BIGINT, v STRING"
    )
    out = str(tmp_path / "ds")
    encode_table(df, out, rows_per_bucket=50)
    rep = analyze_table(spark, out, ndv_columns=["v"])
    # nothing to scan (no values anywhere) but trackedness must commit
    assert rep["chunks_scanned"] == 0 and rep["snapshot"] is not None
    assert ndv_from_metadata(out, "v") == 0
