"""Streaming change data feed (``.option("changefeed", "true")`` on the
named source): per-window increments must equal the batch
``table_changes`` fast path on every append/upsert/delete window shape,
history rewrites and positional deletes must refuse loudly, and the
end-to-end stream must compose to the final table view."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fhirflat_spark.changes import table_changes
from fhirflat_spark.decode import decode_table
from fhirflat_spark.encode import append_table, encode_table, upsert_rows
from fhirflat_spark.manifest import delete_rows, rollback
from fhirflat_spark.sources.datasource import (
    FhirflatChangeFeedReader,
    register,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def cdf_dir(spark, docs, tmp_path_factory):
    """snap1 = doc_id<100; snap2 = upsert 50..149 (+1000 n_chars);
    snap3 = delete {5, 6}; snap4 = append 150..199."""
    out = str(tmp_path_factory.mktemp("cdf") / "ds")
    encode_table(docs.where(F.col("doc_id") < 100), out, rows_per_bucket=50)
    delta = (
        docs.where(F.col("doc_id").between(50, 149))
        .withColumn("n_chars", F.col("n_chars") + 1000)
    )
    upsert_rows(delta, out, "doc_id", rows_per_bucket=50)
    delete_rows(spark, out, "doc_id", [5, 6])
    append_table(docs.where(F.col("doc_id").between(150, 199)), out,
                 rows_per_bucket=50)
    register(spark)
    return out


def _window(out: str, a: int, b: int) -> list[tuple]:
    rdr = FhirflatChangeFeedReader({"path": out}, None)
    rows = []
    for p in rdr.partitions({"snapshot": a}, {"snapshot": b}):
        for rb in rdr.read(p):
            rows.extend(tuple(r.values()) for r in rb.to_pylist())
    return rows


def _split(rows):
    ins = sorted(r[:-1] for r in rows if r[-1] == "insert")
    del_ = {r[:-1] for r in rows if r[-1] == "delete"}
    return ins, del_


def _batch_split(df):
    rows = [tuple(r) for r in df.collect()]
    return _split(rows)


@pytest.mark.parametrize("a,b", [(0, 1), (1, 2), (2, 3), (3, 4), (1, 4)])
def test_windows_match_batch_table_changes(spark, cdf_dir, a, b):
    got_ins, got_del = _split(_window(cdf_dir, a, b))
    if a == 0:
        # snapshot 0 = empty table: everything visible at b is an insert
        exp = decode_table(spark, cdf_dir, snapshot=b)
        assert got_ins == sorted(tuple(r) for r in exp.collect())
        assert got_del == set()
        return
    exp_ins, exp_del = _batch_split(table_changes(spark, cdf_dir, a, b))
    assert got_ins == exp_ins
    assert got_del == exp_del
    if (a, b) == (1, 2):  # upsert window: both sides non-trivial
        assert len(got_ins) == 100 and len(got_del) == 50
    if (a, b) == (2, 3):  # delete-only window
        assert got_ins == [] and len(got_del) == 2


def test_changefeed_composes_to_final_view(spark, cdf_dir):
    """Applying every per-window delta in order reproduces the final
    table (delete = remove all copies matching the row, then insert)."""
    model: list[tuple] = []
    for a in range(0, 4):
        rows = _window(cdf_dir, a, a + 1)
        dels = {r[:-1] for r in rows if r[-1] == "delete"}
        model = [r for r in model if r not in dels]
        model.extend(r[:-1] for r in rows if r[-1] == "insert")
    final = sorted(tuple(r) for r in decode_table(spark, cdf_dir).collect())
    assert sorted(model) == final


def test_changefeed_stream_end_to_end(spark, cdf_dir, tmp_path):
    q = (
        spark.readStream.format("fhirflat").option("path", cdf_dir)
        .option("changefeed", "true").load()
        .writeStream.format("memory").queryName("cdf_e2e")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = spark.sql("select * from cdf_e2e")
    final = decode_table(spark, cdf_dir)
    # one (0, 4] window: the final view arrives as pure inserts
    assert got.where(F.col("_change_type") != "insert").count() == 0
    assert sorted(
        tuple(r) for r in got.drop("_change_type").collect()
    ) == sorted(tuple(r) for r in final.collect())


def test_changefeed_rejects_batch_read(spark, cdf_dir):
    with pytest.raises(Exception, match="streaming option"):
        (
            spark.read.format("fhirflat").option("path", cdf_dir)
            .option("changefeed", "true").load().collect()
        )


def test_changefeed_refuses_history_rewrite(spark, docs, tmp_path):
    out = str(tmp_path / "rb")
    encode_table(docs.where(F.col("doc_id") < 50), out, rows_per_bucket=50)
    append_table(docs.where(F.col("doc_id").between(50, 99)), out,
                 rows_per_bucket=50)
    rollback(spark, out, 1)  # snapshot 3 rewrites history
    rdr = FhirflatChangeFeedReader({"path": out}, None)
    with pytest.raises(RuntimeError, match="rewrote table history"):
        rdr.partitions({"snapshot": 2}, {"snapshot": 3})


def test_changefeed_refuses_positional_deletes(spark, docs, tmp_path):
    from fhirflat_spark.manifest import delete_rows_at

    out = str(tmp_path / "pos")
    encode_table(docs.where(F.col("doc_id") < 50), out, rows_per_bucket=50)
    pos = (
        decode_table(spark, out, with_positions=True)
        .where(F.col("doc_id") == 1)
        .select(
            F.col("__part_id").alias("part_id"),
            F.col("__chunk_seq").alias("chunk_seq"),
            F.col("__row_idx").alias("row_idx"),
        )
    )
    delete_rows_at(spark, out, pos)
    rdr = FhirflatChangeFeedReader({"path": out}, None)
    with pytest.raises(RuntimeError, match="positional"):
        rdr.partitions({"snapshot": 1}, {"snapshot": 2})


def test_changefeed_column_pruning(spark, cdf_dir):
    """A pruned changefeed still masks deletes correctly even when the
    delete-key column is outside the selected columns."""
    rdr = FhirflatChangeFeedReader(
        {"path": cdf_dir, "columns": "lang,n_chars"}, None
    )
    rows = []
    for p in rdr.partitions({"snapshot": 2}, {"snapshot": 3}):
        for rb in rdr.read(p):
            assert rb.schema.names == ["lang", "n_chars", "_change_type"]
            rows.extend(tuple(r.values()) for r in rb.to_pylist())
    exp = (
        table_changes(spark, cdf_dir, 2, 3)
        .select("lang", "n_chars", "_change_type")
    )
    assert sorted(rows) == sorted(tuple(r) for r in exp.collect())
