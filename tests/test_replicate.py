"""CDF-driven table replication: the mirror must equal the source's
current view after every replicate call, through appends / upserts /
deletes / rollbacks / compaction resets, advance incrementally when the
lineage allows it, full-sync when it doesn't, and converge under
crash-retry of a half-applied window."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from fhirflat_spark.decode import decode_table
from fhirflat_spark.encode import append_table, encode_table, upsert_rows
from fhirflat_spark.maintenance import maintain_table
from fhirflat_spark.manifest import delete_rows, rollback
from fhirflat_spark.replicate import (
    read_replication_state,
    replicate_table,
)

COLS = ["doc_id", "lang", "n"]


def _df(spark, rows):
    return spark.createDataFrame(
        [(int(i), l, int(n)) for i, l, n in rows], COLS
    )


def _rows(spark, out):
    return sorted(
        tuple(r) for r in decode_table(spark, out).select(*COLS).collect()
    )


def _mk(rng, ids):
    return [(i, rng.choice(["en", "fr"]), rng.randrange(100)) for i in ids]


def _assert_mirrored(spark, src, dst):
    assert _rows(spark, dst) == _rows(spark, src)


def test_replicate_full_then_incremental(spark, tmp_path):
    rng = random.Random(5)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    encode_table(_df(spark, _mk(rng, range(100))), src, rows_per_bucket=50)

    info = replicate_table(spark, src, dst, "doc_id", rows_per_bucket=50)
    assert info["mode"] == "full" and info["rows"] == 100
    _assert_mirrored(spark, src, dst)

    # noop when the source didn't move
    assert replicate_table(spark, src, dst, "doc_id")["mode"] == "noop"

    # append + delete + upsert, one replicate call applies all three
    append_table(_df(spark, _mk(rng, range(100, 140))), src,
                 rows_per_bucket=50)
    delete_rows(spark, src, "doc_id", [3, 7, 120])
    upsert_rows(_df(spark, _mk(rng, range(90, 110))), src, "doc_id",
                rows_per_bucket=50)
    info = replicate_table(spark, src, dst, "doc_id", rows_per_bucket=50)
    assert info["mode"] == "incremental"
    assert info["inserts"] > 0 and info["deletes"] > 0
    _assert_mirrored(spark, src, dst)
    st = read_replication_state(dst)
    assert st["src_snapshot"] == 4 and st["key_column"] == "doc_id"


def test_replicate_key_column_mismatch_rejected(spark, tmp_path):
    rng = random.Random(6)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    encode_table(_df(spark, _mk(rng, range(20))), src, rows_per_bucket=50)
    replicate_table(spark, src, dst, "doc_id")
    with pytest.raises(ValueError, match="key_column"):
        replicate_table(spark, src, dst, "lang")


def test_replicate_through_rollback_window(spark, tmp_path):
    """A rollback above the pin rewrites history; the changelog's
    exceptAll general path still yields a correct incremental window."""
    rng = random.Random(7)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    encode_table(_df(spark, _mk(rng, range(60))), src, rows_per_bucket=50)
    replicate_table(spark, src, dst, "doc_id", rows_per_bucket=50)

    append_table(_df(spark, _mk(rng, range(60, 90))), src,
                 rows_per_bucket=50)
    rollback(spark, src, 1)          # drop the append again
    append_table(_df(spark, _mk(rng, range(200, 220))), src,
                 rows_per_bucket=50)
    info = replicate_table(spark, src, dst, "doc_id", rows_per_bucket=50)
    assert info["mode"] == "incremental"
    _assert_mirrored(spark, src, dst)


def test_replicate_resync_after_source_reset(spark, tmp_path):
    """A source history reset (fresh re-encode into the same dir) makes
    the pinned (version, sha) unresolvable — replicate must full-sync,
    never apply a delta across lineages."""
    import shutil

    rng = random.Random(8)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    encode_table(_df(spark, _mk(rng, range(50))), src, rows_per_bucket=50)
    replicate_table(spark, src, dst, "doc_id", rows_per_bucket=50)

    shutil.rmtree(src)
    encode_table(_df(spark, _mk(rng, range(30, 80))), src,
                 rows_per_bucket=50)
    info = replicate_table(spark, src, dst, "doc_id", rows_per_bucket=50)
    assert info["mode"] == "full"
    _assert_mirrored(spark, src, dst)


def test_replicate_resync_after_compaction_swap(spark, tmp_path):
    """maintain_table's compaction swap resets the source lineage (new
    content shas, history traded for layout) — the pin must detect it."""
    rng = random.Random(9)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    # compaction policy needs n_partitions > defaultParallelism (4 in
    # the test session), fragmentation > 0.5 and snapshot log > 1
    encode_table(_df(spark, _mk(rng, range(80))), src, rows_per_bucket=10)
    append_table(_df(spark, _mk(rng, range(80, 110))), src,
                 rows_per_bucket=10)
    delete_rows(spark, src, "doc_id", list(range(0, 40)))
    replicate_table(spark, src, dst, "doc_id", rows_per_bucket=50)
    rep = maintain_table(spark, src, rows_per_bucket=400, keep_snapshots=1)
    assert rep["compacted"], "fixture must actually trigger the swap"
    append_table(_df(spark, _mk(rng, range(300, 320))), src,
                 rows_per_bucket=50)
    info = replicate_table(spark, src, dst, "doc_id", rows_per_bucket=50)
    assert info["mode"] == "full"
    _assert_mirrored(spark, src, dst)


def test_replicate_crash_retry_converges(spark, tmp_path, monkeypatch):
    """Crash AFTER the apply commits but BEFORE the pin advances: the
    retry re-applies the same window onto the already-updated mirror
    and must converge (idempotent deletes + shadow-deleting upsert)."""
    import fhirflat_spark.replicate as R

    rng = random.Random(10)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    encode_table(_df(spark, _mk(rng, range(60))), src, rows_per_bucket=50)
    replicate_table(spark, src, dst, "doc_id", rows_per_bucket=50)

    upsert_rows(_df(spark, _mk(rng, range(40, 80))), src, "doc_id",
                rows_per_bucket=50)
    delete_rows(spark, src, "doc_id", [1, 2])

    real = R._write_state
    boom = {"armed": True}

    def crashing(dst_, state):
        if boom["armed"]:
            boom["armed"] = False
            raise OSError("simulated crash before pin advance")
        real(dst_, state)

    monkeypatch.setattr(R, "_write_state", crashing)
    with pytest.raises(OSError, match="simulated"):
        replicate_table(spark, src, dst, "doc_id", rows_per_bucket=50)
    # window applied but pin stale — mirror is ALREADY correct
    _assert_mirrored(spark, src, dst)
    info = replicate_table(spark, src, dst, "doc_id", rows_per_bucket=50)
    assert info["mode"] == "incremental"  # same window, re-applied
    _assert_mirrored(spark, src, dst)
    assert replicate_table(spark, src, dst, "doc_id")["mode"] == "noop"


def test_replicate_fuzz(spark, tmp_path):
    """Random op interleavings on the source; replicate every couple of
    steps — the mirror must always equal the source afterwards."""
    rng = random.Random(77)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    next_id = 80
    encode_table(_df(spark, _mk(rng, range(next_id))), src,
                 rows_per_bucket=40)
    replicate_table(spark, src, dst, "doc_id", rows_per_bucket=40)
    live = set(range(next_id))
    for step in range(10):
        op = rng.choice(["append", "upsert", "delete", "append"])
        if op == "append":
            ids = range(next_id, next_id + rng.randrange(10, 30))
            next_id = ids.stop
            append_table(_df(spark, _mk(rng, ids)), src, rows_per_bucket=40)
            live |= set(ids)
        elif op == "upsert":
            touch = rng.sample(sorted(live), min(len(live), 15))
            upsert_rows(_df(spark, _mk(rng, touch)), src, "doc_id",
                        rows_per_bucket=40)
        else:
            doomed = rng.sample(sorted(live), min(len(live), 10))
            delete_rows(spark, src, "doc_id", doomed)
            live -= set(doomed)
        if step % 2 == 1:
            replicate_table(spark, src, dst, "doc_id", rows_per_bucket=40)
            _assert_mirrored(spark, src, dst)
    replicate_table(spark, src, dst, "doc_id", rows_per_bucket=40)
    _assert_mirrored(spark, src, dst)
