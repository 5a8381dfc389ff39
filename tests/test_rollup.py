"""Continuous rollup (rollup.py): incremental refresh from the snapshot
changelog must equal a from-scratch recompute across append, upsert, and
delete windows; emptied buckets drop; refresh is a no-op when current;
the state pointer flips atomically (old state readable until then)."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from fhirflat_spark.encode import append_table, encode_table, upsert_rows
from fhirflat_spark.manifest import delete_rows
from fhirflat_spark.rollup import build_rollup, read_rollup, refresh_rollup

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)


def _events(spark, ids, hour_of=lambda i: i % 5, cents_of=lambda i: i * 10):
    rows = [
        (i, T0 + dt.timedelta(hours=hour_of(i), minutes=i % 60),
         "t" + str(i % 2), cents_of(i))
        for i in ids
    ]
    return spark.createDataFrame(rows, ["event_id", "ts", "kind", "cents"])


def _recompute(spark, table_dir):
    from fhirflat_spark.decode import decode_table

    return (
        decode_table(spark, table_dir)
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket"), "kind")
        .agg(F.count("*").cast("long").alias("n"),
             F.sum("cents").alias("cents_sum"))
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def table(spark, tmp_path):
    out = str(tmp_path / "t")
    encode_table(_events(spark, range(200)), out, rows_per_bucket=50)
    build_rollup(spark, out, f"{out}/r", ts_col="ts", bucket="hour",
                 group_cols=("kind",), sum_cols=("cents",))
    return out


def test_refresh_after_append_matches_recompute(spark, table):
    append_table(_events(spark, range(200, 320)), table, rows_per_bucket=50)
    meta = refresh_rollup(spark, table, f"{table}/r")
    assert meta["snapshot"] == 2
    assert _rows(read_rollup(spark, f"{table}/r")) == _rows(
        _recompute(spark, table)
    )


def test_refresh_after_upsert_subtracts_preimages(spark, table):
    # re-price half the rows (delete pre-image + insert post-image in the
    # changelog) and add new ones
    delta = _events(spark, range(0, 250, 2), cents_of=lambda i: i * 10 + 7)
    upsert_rows(delta, table, "event_id", rows_per_bucket=50)
    refresh_rollup(spark, table, f"{table}/r")
    assert _rows(read_rollup(spark, f"{table}/r")) == _rows(
        _recompute(spark, table)
    )


def test_refresh_drops_emptied_buckets(spark, table):
    # hour bucket 4 holds exactly ids with i % 5 == 4 — delete them all
    doomed = [i for i in range(200) if i % 5 == 4]
    delete_rows(spark, table, "event_id", doomed)
    refresh_rollup(spark, table, f"{table}/r")
    got = read_rollup(spark, f"{table}/r")
    assert got.where(F.hour("bucket") == 4).count() == 0
    assert _rows(got) == _rows(_recompute(spark, table))


def test_refresh_noop_when_current(spark, table):
    before = _rows(read_rollup(spark, f"{table}/r"))
    meta = refresh_rollup(spark, table, f"{table}/r")
    assert meta["snapshot"] == 1
    assert _rows(read_rollup(spark, f"{table}/r")) == before


def test_chained_refreshes(spark, table):
    append_table(_events(spark, range(200, 260)), table, rows_per_bucket=50)
    refresh_rollup(spark, table, f"{table}/r")
    delete_rows(spark, table, "event_id", list(range(0, 50)))
    refresh_rollup(spark, table, f"{table}/r")
    assert _rows(read_rollup(spark, f"{table}/r")) == _rows(
        _recompute(spark, table)
    )


def test_refresh_across_rollback_window(spark, table):
    # rewritten history: append, then roll the table back — the refresh
    # window (1 → post-rollback snapshot) takes the changelog's general
    # exceptAll path and must still land on the recompute
    from fhirflat_spark.manifest import rollback

    append_table(_events(spark, range(200, 280)), table, rows_per_bucket=50)
    rollback(spark, table, 1)
    refresh_rollup(spark, table, f"{table}/r")
    assert _rows(read_rollup(spark, f"{table}/r")) == _rows(
        _recompute(spark, table)
    )


def test_refresh_rebuilds_after_history_reset(spark, table):
    """A fresh re-encode resets the lineage; once new commits push the
    version past the rollup's pinned one, the window looks like a
    plausible delta of the WRONG history. The pinned snapshot's content
    sha detects it: refresh rebuilds and matches the recompute."""
    build_rollup(spark, table, f"{table}/r", ts_col="ts", bucket="hour",
                 group_cols=("kind",), sum_cols=("cents",))
    append_table(_events(spark, range(200, 260)), table, rows_per_bucket=50)
    refresh_rollup(spark, table, f"{table}/r")  # pinned at v2 now
    encode_table(_events(spark, range(500, 560)), table, rows_per_bucket=50)
    append_table(_events(spark, range(560, 600)), table, rows_per_bucket=50)
    append_table(_events(spark, range(600, 640)), table, rows_per_bucket=50)
    meta = refresh_rollup(spark, table, f"{table}/r")
    assert meta["snapshot"] == 3  # rebuilt against the new lineage
    assert _rows(read_rollup(spark, f"{table}/r")) == _rows(
        _recompute(spark, table)
    )


def test_refresh_rebuilds_when_reset_lands_on_pinned_version(spark, table):
    """A history reset whose new lineage advances to EXACTLY the pinned
    version number hits the ``to == frm`` fast path — which must check
    the pinned snapshot's content sha before declaring a no-op, or it
    silently returns the stale pre-reset rollup (round-4 advice)."""
    # pinned at v1; fresh re-encode resets lineage back to v1 with
    # entirely different content — version number matches, content can't
    encode_table(_events(spark, range(700, 780)), table, rows_per_bucket=50)
    meta = refresh_rollup(spark, table, f"{table}/r")
    assert meta["snapshot"] == 1
    assert _rows(read_rollup(spark, f"{table}/r")) == _rows(
        _recompute(spark, table)
    )


def test_old_state_kept_until_pointer_flip(spark, table, tmp_path):
    # keep_old preserves the previous version dir for time-travel reads
    append_table(_events(spark, range(200, 230)), table, rows_per_bucket=50)
    refresh_rollup(spark, table, f"{table}/r", keep_old=True)
    import os

    assert os.path.isdir(f"{table}/r/v1") and os.path.isdir(f"{table}/r/v2")
    meta = json.load(open(f"{table}/r/rollup.json"))
    assert meta["snapshot"] == 2
    # the pointer governs reads: current state is v2's content
    assert _rows(read_rollup(spark, f"{table}/r")) == _rows(
        _recompute(spark, table)
    )
