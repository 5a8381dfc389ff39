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


def _view_rows(spark, src, where, cols):
    df = decode_table(spark, src).where(where).select(*cols)
    return sorted(tuple(r) for r in df.collect())


def test_replicate_filtered_view_with_flips(spark, tmp_path):
    """where= mirror: updates that flip rows OUT of the predicate must
    delete them from the mirror, flips IN must appear, and the
    projection drops the non-selected columns."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    rows = [(i, "en" if i % 2 else "fr", i * 10) for i in range(40)]
    encode_table(_df(spark, rows), src, rows_per_bucket=50)
    kw = dict(where="n < 200", columns=["doc_id", "n"])
    info = replicate_table(spark, src, dst, "doc_id",
                           rows_per_bucket=50, **kw)
    assert info["mode"] == "full" and info["rows"] == 20
    assert _rows_sel(spark, dst) == _view_rows(spark, src, "n < 200",
                                               ["doc_id", "n"])

    # flip OUT: 5,6 jump above the bar; flip IN: 30 drops below it;
    # plain update inside the view: 7 stays; delete: 3 (in view), 25
    # (outside it); fresh inserts on both sides of the bar
    upsert_rows(_df(spark, [(5, "en", 900), (6, "fr", 950),
                            (30, "en", 50), (7, "en", 111)]),
                src, "doc_id", rows_per_bucket=50)
    delete_rows(spark, src, "doc_id", [3, 25])
    append_table(_df(spark, [(100, "en", 42), (101, "fr", 4200)]), src,
                 rows_per_bucket=50)
    info = replicate_table(spark, src, dst, "doc_id",
                           rows_per_bucket=50, **kw)
    assert info["mode"] == "incremental"
    assert info["deletes"] >= 3          # 3 (deleted), 5, 6 (flipped out)
    got = _rows_sel(spark, dst)
    assert got == _view_rows(spark, src, "n < 200", ["doc_id", "n"])
    ids = {r[0] for r in got}
    assert {30, 7, 100} <= ids and not {5, 6, 3, 25, 101} & ids


def _rows_sel(spark, out):
    df = decode_table(spark, out)
    return sorted(tuple(r) for r in df.select(*sorted(df.columns)).collect())


def test_replicate_projection_must_keep_key(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    encode_table(_df(spark, _mk(random.Random(1), range(10))), src,
                 rows_per_bucket=50)
    with pytest.raises(ValueError, match="retain the key"):
        replicate_table(spark, src, dst, "doc_id", columns=["lang"])


def test_replicate_view_definition_change_resyncs(spark, tmp_path):
    """A different where=/columns= is a different view — the stored
    state must not be treated as a delta base."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    rows = [(i, "en", i) for i in range(30)]
    encode_table(_df(spark, rows), src, rows_per_bucket=50)
    replicate_table(spark, src, dst, "doc_id", where="n < 10")
    info = replicate_table(spark, src, dst, "doc_id", where="n < 20")
    assert info["mode"] == "full" and info["rows"] == 20
    # same definition again = noop
    assert replicate_table(spark, src, dst, "doc_id",
                           where="n < 20")["mode"] == "noop"


def test_replicate_append_delete_window_skips_changelog(spark, tmp_path,
                                                        monkeypatch):
    """The metadata-fast window path: append + equality-delete + upsert
    windows must replicate WITHOUT the general changelog (delete keys
    read from the key files, inserts from the new partitions only) —
    proven by making table_changes unreachable."""
    import fhirflat_spark.changes as C

    rng = random.Random(11)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    encode_table(_df(spark, _mk(rng, range(60))), src, rows_per_bucket=50)
    replicate_table(spark, src, dst, "doc_id", rows_per_bucket=50)

    append_table(_df(spark, _mk(rng, range(60, 90))), src,
                 rows_per_bucket=50)
    delete_rows(spark, src, "doc_id", [2, 4, 61])
    upsert_rows(_df(spark, _mk(rng, range(50, 70))), src, "doc_id",
                rows_per_bucket=50)

    def boom(*a, **k):
        raise AssertionError("general changelog invoked on a fast window")

    monkeypatch.setattr(C, "table_changes", boom)
    info = replicate_table(spark, src, dst, "doc_id", rows_per_bucket=50)
    assert info["mode"] == "incremental"
    _assert_mirrored(spark, src, dst)


def test_replicate_positional_delete_falls_back(spark, tmp_path):
    """Positional deletes carry no key values — the key-file path must
    bail and the general changelog still produce a correct mirror."""
    from fhirflat_spark.manifest import delete_rows_at

    rng = random.Random(12)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    encode_table(_df(spark, _mk(rng, range(50))), src, rows_per_bucket=50)
    replicate_table(spark, src, dst, "doc_id", rows_per_bucket=50)

    pos = (
        decode_table(spark, src, with_positions=True)
        .where(F.col("doc_id").isin([5, 6, 7]))
        .select("__part_id", "__chunk_seq", "__row_idx")
        .toDF("part_id", "chunk_seq", "row_idx")
    )
    delete_rows_at(spark, src, pos)
    info = replicate_table(spark, src, dst, "doc_id", rows_per_bucket=50)
    assert info["mode"] == "incremental"
    _assert_mirrored(spark, src, dst)
    assert not {5, 6, 7} & {r[0] for r in _rows(spark, dst)}


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
