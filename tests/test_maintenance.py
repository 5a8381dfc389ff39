"""Table maintenance (fhirflat_spark/maintenance.py): fragmentation
health from metadata, policy compaction with a verified swap, snapshot
expiry + vacuum, and streaming snapshot retention.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def fragmented(spark, tmp_path):
    """Many tiny appends → a fragmented table (every partition far under
    rows_per_bucket)."""
    from fhirflat_spark.encode import append_table, encode_table

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "ds")
    encode_table(docs.where(F.col("doc_id") < 100), out, rows_per_bucket=5000)
    for lo in range(100, 600, 100):
        append_table(
            docs.where(F.col("doc_id").between(lo, lo + 99)), out,
            rows_per_bucket=5000,
        )
    return out, docs.where(F.col("doc_id") < 600)


def test_health_reports_fragmentation(spark, fragmented):
    from fhirflat_spark.maintenance import table_health

    out, src = fragmented
    h = table_health(spark, out, rows_per_bucket=5000)
    assert h["rows"] == src.count()
    assert h["n_partitions"] > h["ideal_partitions"]
    assert h["fragmentation"] > 0.5
    assert h["n_snapshots"] == 6


def test_dry_run_touches_nothing(spark, fragmented):
    from fhirflat_spark.maintenance import maintain_table, table_health

    out, _ = fragmented
    before = table_health(spark, out, rows_per_bucket=5000)
    rep = maintain_table(spark, out, rows_per_bucket=5000, dry_run=True)
    assert rep["would_compact"] is True
    assert table_health(spark, out, rows_per_bucket=5000) == before


def test_maintain_compacts_expires_and_preserves_content(spark, fragmented):
    from fhirflat_spark.decode import decode_table
    from fhirflat_spark.maintenance import maintain_table

    out, src = fragmented
    from fhirflat_spark.maintenance import table_health

    before = table_health(spark, out, rows_per_bucket=5000)
    rep = maintain_table(spark, out, rows_per_bucket=5000, keep_snapshots=2)
    assert rep["compacted"] is True
    after = rep["health_after"]
    # converges to the parallelism floor (encode cannot go below it)
    assert after["n_partitions"] < before["n_partitions"]
    assert after["n_partitions"] <= max(
        2 * after["ideal_partitions"], spark.sparkContext.defaultParallelism
    )
    assert after["rows"] == src.count()
    dec = decode_table(spark, out)
    assert dec.exceptAll(src).count() == 0 and src.exceptAll(dec).count() == 0
    # compaction swapped a fresh dataset in: snapshot log restarted
    assert after["n_snapshots"] <= 2
    # idempotent: a second pass finds a healthy table and does nothing
    rep2 = maintain_table(spark, out, rows_per_bucket=5000, keep_snapshots=2)
    assert rep2["compacted"] is False and rep2["would_compact"] is False


def test_maintain_accepts_file_prefixed_path(spark, fragmented):
    """The directory swap must handle the `file:` URI form Spark paths
    often carry (os.rename needs the bare path)."""
    from fhirflat_spark.decode import decode_table
    from fhirflat_spark.maintenance import maintain_table

    out, src = fragmented
    rep = maintain_table(spark, f"file:{out}", rows_per_bucket=5000,
                         keep_snapshots=2)
    assert rep["compacted"] is True
    dec = decode_table(spark, out)
    assert dec.count() == src.count()


def test_maintain_healthy_table_only_expires(spark, tmp_path):
    from fhirflat_spark.encode import append_table, encode_table
    from fhirflat_spark.maintenance import maintain_table

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "ds")
    # ~50-row partitions at rows_per_bucket=60: everything >= half-filled
    encode_table(docs.where(F.col("doc_id") % 2 == 0), out, rows_per_bucket=60)
    append_table(docs.where(F.col("doc_id") % 2 == 1), out, rows_per_bucket=60)
    rep = maintain_table(spark, out, rows_per_bucket=60, keep_snapshots=1)
    assert rep["compacted"] is False
    assert rep["expired_snapshots"] == [1]
    assert rep["vacuumed_part_ids"] == []  # everything still referenced


def test_streaming_snapshot_retention(spark, tmp_path):
    from fhirflat_spark.manifest import _snapshot_versions, current_snapshot
    from fhirflat_spark.streaming import encode_stream_incremental

    src_dir = str(tmp_path / "src")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.limit(400).repartition(4).write.parquet(src_dir)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out = str(tmp_path / "ds")
    q = encode_stream_incremental(
        stream, out, str(tmp_path / "ckpt"), rows_per_bucket=200,
        snapshot_keep_last=2,
    ).start()
    q.awaitTermination(120)
    # several micro-batch commits happened, only the last 2 retained
    assert current_snapshot(out) >= 3
    assert len(_snapshot_versions(out)) <= 2


def test_maintain_recovers_parked_table_after_crashed_swap(spark, fragmented):
    """A crash between the two swap renames leaves the table parked at
    .pre_compact — the next maintenance call must restore it before
    doing anything else."""
    import os

    from fhirflat_spark.decode import decode_table
    from fhirflat_spark.maintenance import maintain_table

    out, src = fragmented
    os.rename(out, f"{out}.pre_compact")  # simulate the crash window
    rep = maintain_table(spark, out, rows_per_bucket=5000, keep_snapshots=2)
    assert os.path.isdir(out)
    assert not os.path.exists(f"{out}.pre_compact")
    assert decode_table(spark, out).count() == src.count()
