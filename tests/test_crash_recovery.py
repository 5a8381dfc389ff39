"""Crash-window recovery: task-written manifest fragments vs the
snapshot commit protocol.

Tasks durably write their manifest fragments DURING the job (the
Iceberg-manifest pattern, encode.py:_write_fragment) while the snapshot
commits only at the driver. A job killed between those two points
leaves fragments no snapshot references; every later fragment merge
must be immune to them, and metadata commits (rollback) must never
sweep fragments a still-retained snapshot needs.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from fhirflat_spark import fsio
from fhirflat_spark.decode import decode_table
from fhirflat_spark.encode import append_table, encode_table
from fhirflat_spark.manifest import (
    current_snapshot,
    delete_rows,
    drop_branch,
    expire_snapshots,
    read_summary,
    rollback,
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


def _plant_crashed_fragment(out_dir: str, pid: int) -> str:
    """Simulate a killed append attempt: a task-committed fragment for a
    part id whose chunk files never reached the job commit (under the
    v1 output committer a killed job publishes no chunk dirs, but the
    kernel's fsio fragment write already happened)."""
    frag_dir = f"{out_dir}/manifest_parts"
    name = sorted(fsio.list_files(frag_dir, suffix=".json"))[0]
    rows = json.loads(fsio.read_bytes(f"{frag_dir}/{name}"))
    for r in rows:
        r["part_id"] = pid
    fsio.write_bytes_atomic(f"{frag_dir}/{pid:06d}.json",
                            json.dumps(rows).encode())
    return f"{frag_dir}/{pid:06d}.json"


def test_append_sweeps_crashed_attempt_fragments(spark, docs, base):
    # crashed attempt planned MORE partitions than the retry will: its
    # high-pid fragments must not merge into the retry's manifest as
    # phantom partitions pointing at chunk dirs that never committed
    summary = read_summary(spark, base)
    n_before = summary["num_partitions"]
    phantom = _plant_crashed_fragment(base, pid=500)
    res = append_table(docs.where(F.col("doc_id").between(100, 119)), base,
                       rows_per_bucket=50)
    assert not fsio.exists(phantom)
    manifest_ids = set(
        r["part_id"]
        for r in spark.read.parquet(f"{base}/manifest").collect()
    )
    assert 500 not in manifest_ids
    assert res.rows == 120
    assert decode_table(spark, base).count() == 120
    assert len(manifest_ids) > n_before


def test_rollback_keeps_staged_branch_fragments(spark, docs, base):
    # rollback is a MAIN metadata commit allowed while a branch is
    # staged; its fragment sweep must spare the staged partitions or a
    # later staged append silently loses them from the branch manifest
    v1 = current_snapshot(base)
    append_table(docs.where(F.col("doc_id").between(100, 149)), base,
                 rows_per_bucket=50, branch="audit")
    delete_rows(spark, base, "doc_id", [1])
    rollback(spark, base, v1)
    # continuing the staging cycle re-merges fragments: the earlier
    # staged rows must still be in the branch's new head
    append_table(docs.where(F.col("doc_id").between(150, 159)), base,
                 rows_per_bucket=50, branch="audit")
    staged = decode_table(spark, base, snapshot="audit")
    assert staged.where(F.col("doc_id").between(100, 149)).count() == 50
    assert staged.count() == 160
    # main is unaffected by the staged lineage
    assert decode_table(spark, base).count() == 100
    drop_branch(base, "audit")
    assert decode_table(spark, base).count() == 100


def test_drop_branch_survives_expired_base(spark, docs, base):
    # main may advance via metadata commits while a branch is staged;
    # expire_snapshots can then reclaim the branch's BASE snapshot —
    # drop_branch must not depend on reading it
    append_table(docs.where(F.col("doc_id").between(100, 149)), base,
                 rows_per_bucket=50, branch="audit")
    delete_rows(spark, base, "doc_id", [1])
    delete_rows(spark, base, "doc_id", [2])
    expired = expire_snapshots(base, keep_last=1)
    assert expired  # the branch base (v1) is reclaimable: not cur, untagged
    dropped = drop_branch(base, "audit")
    assert dropped
    # the table is healthy: main readable, data commits accepted again
    assert decode_table(spark, base).count() == 98
    append_table(docs.where(F.col("doc_id").between(160, 169)), base,
                 rows_per_bucket=50)
    assert decode_table(spark, base).count() == 108
