"""AS-OF-timestamp time travel: every snapshot commit stamps its
wall-clock instant (epoch micros, ``fhirflat.committed_at_us`` in the
snapshot manifest's metadata — the Iceberg snapshot-log ``timestamp-ms``
analog), and ``snapshot_as_of`` resolves an instant to the snapshot that
was current then. Stamps ride METADATA only — the dataset checksum
(content-sha-based) and the golden manifest pin are unaffected.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture()
def ds(spark, docs, tmp_path):
    """snapshot 1 = even doc_id, snapshot 2 = +odd, snapshot 3 = delete."""
    from fhirflat_spark.encode import append_table, encode_table
    from fhirflat_spark.manifest import delete_rows

    out = str(tmp_path / "ds")
    base = docs.where(F.col("doc_id") % 2 == 0)
    delta = docs.where(F.col("doc_id") % 2 == 1)
    encode_table(base, out, rows_per_bucket=500)
    append_table(delta, out, rows_per_bucket=500)
    delete_rows(spark, out, "doc_id", [0, 2, 4])
    return out, base, delta


def _same_rows(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_stamps_monotonic_and_listed(spark, ds):
    from fhirflat_spark.manifest import (
        list_snapshots,
        snapshot_committed_at,
    )

    out, _, _ = ds
    stamps = [snapshot_committed_at(out, v) for v in (1, 2, 3)]
    assert all(s is not None for s in stamps)
    assert stamps == sorted(stamps)  # version order = commit order
    log = {r["version"]: r for r in list_snapshots(spark, out).collect()}
    for v in (1, 2, 3):
        assert log[v]["committed_at_us"] == stamps[v - 1]


def test_as_of_resolves_each_epoch(spark, ds):
    from fhirflat_spark.manifest import snapshot_as_of, snapshot_committed_at

    out, _, _ = ds
    t1, t2, t3 = (snapshot_committed_at(out, v) for v in (1, 2, 3))
    # exactly-at and just-before boundaries, epoch-seconds form
    assert snapshot_as_of(out, t1 / 1e6) == 1
    assert snapshot_as_of(out, (t2 - 1) / 1e6) == 1
    assert snapshot_as_of(out, t2 / 1e6) == 2
    assert snapshot_as_of(out, (t3 - 1) / 1e6) == 2
    assert snapshot_as_of(out, t3 / 1e6 + 60) == 3
    with pytest.raises(ValueError, match="predates"):
        snapshot_as_of(out, (t1 - 1) / 1e6)


def test_as_of_iso_string(spark, ds):
    from fhirflat_spark.manifest import snapshot_as_of, snapshot_committed_at

    out, _, _ = ds
    t2 = snapshot_committed_at(out, 2)
    iso = datetime.datetime.fromtimestamp(
        t2 / 1e6, tz=datetime.timezone.utc
    ).isoformat()
    assert snapshot_as_of(out, iso) == 2
    # naive ISO strings are read as UTC
    naive = datetime.datetime.fromtimestamp(
        t2 / 1e6, tz=datetime.timezone.utc
    ).replace(tzinfo=None).isoformat()
    assert snapshot_as_of(out, naive) == 2


def test_decode_and_datasource_as_of(spark, ds):
    from fhirflat_spark.decode import decode_table
    from fhirflat_spark.manifest import snapshot_committed_at
    from fhirflat_spark.sources.datasource import register

    out, base, delta = ds
    t2 = snapshot_committed_at(out, 2)
    ts = t2 / 1e6
    want = decode_table(spark, out, snapshot=2)
    assert _same_rows(decode_table(spark, out, as_of=ts), want)
    register(spark)
    via_src = (
        spark.read.format("fhirflat").option("path", out)
        .option("as_of", str(ts)).load()
    )
    assert _same_rows(via_src, want)
    with pytest.raises(ValueError, match="not both"):
        decode_table(spark, out, snapshot=1, as_of=ts)


def test_rollback_restamps_now(spark, ds):
    from fhirflat_spark.manifest import (
        rollback,
        snapshot_as_of,
        snapshot_committed_at,
    )

    out, _, _ = ds
    rollback(spark, out, 1)
    t4 = snapshot_committed_at(out, 4)
    assert t4 is not None and t4 >= snapshot_committed_at(out, 3)
    # at "now", the table is the rolled-back state, not v3
    assert snapshot_as_of(out, t4 / 1e6 + 60) == 4


def test_unstamped_legacy_snapshot_sorts_first(spark, ds):
    """A snapshot written before stamps existed (metadata key absent)
    is eligible for any as_of — version order is commit order."""
    import pyarrow as pa

    from fhirflat_spark import fsio
    from fhirflat_spark.manifest import (
        snapshot_as_of,
        snapshot_committed_at,
        snapshot_manifest_path,
    )

    out, _, _ = ds
    p = snapshot_manifest_path(out, 1)
    t = fsio.read_parquet(p)
    meta = {k: v for k, v in (t.schema.metadata or {}).items()
            if k != b"fhirflat.committed_at_us"}
    fsio.write_parquet_atomic(t.replace_schema_metadata(meta), p, token="t")
    assert snapshot_committed_at(out, 1) is None
    t2 = snapshot_committed_at(out, 2)
    assert snapshot_as_of(out, (t2 - 1) / 1e6) == 1
    assert snapshot_as_of(out, t2 / 1e6) == 2


def test_staged_branch_not_visible_to_as_of(spark, docs, tmp_path):
    from fhirflat_spark.encode import append_table, encode_table
    from fhirflat_spark.manifest import (
        publish_branch,
        snapshot_as_of,
        snapshot_committed_at,
    )

    out = str(tmp_path / "wap")
    encode_table(docs.where(F.col("doc_id") % 2 == 0), out,
                 rows_per_bucket=500)
    append_table(docs.where(F.col("doc_id") % 2 == 1), out,
                 rows_per_bucket=500, branch="audit")
    t_staged = snapshot_committed_at(out, 2)
    assert t_staged is not None
    # staged head is invisible to main's wall-clock axis...
    assert snapshot_as_of(out, t_staged / 1e6 + 60) == 1
    # ...until publish, which re-stamps at the publish instant
    published = publish_branch(out, "audit")
    t_pub = snapshot_committed_at(out, published)
    assert t_pub >= t_staged
    assert snapshot_as_of(out, t_pub / 1e6 + 60) == published
