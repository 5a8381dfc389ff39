"""CDF-driven incremental table replication (mirror maintenance).

``replicate_table(spark, src, dst, key_column)`` keeps an encoded table
``dst`` equal to the current view of ``src`` by applying snapshot-log
deltas instead of recopying — the ops tool behind "mirror the curated
table to the serving / training cluster":

- **First call** (or after a source history RESET): full sync —
  decode the source's current view and REPLACE the mirror through the
  named sink.
- **Steady state**: ``table_changes(pinned, current)`` is applied as
  one equality-delete commit (keys deleted without replacement; the
  keys DataFrame goes straight to ``delete_rows`` — nothing
  data-sized touches the driver) plus one ``upsert_rows`` commit
  (inserted/updated rows). Cost ∝ the delta, never the table; rewound
  or compacted windows above the pin still replicate incrementally via
  the changelog's ``exceptAll`` general path.
- **Pin**: ``_REPLICATION.json`` at the mirror stores the applied
  source ``(snapshot, content sha)``. A source whose history was reset
  (fresh re-encode, compaction swap — detected exactly like
  rollup/dedup-index lineage pins: the stored sha no longer matches
  the pinned version, or the pinned manifest is expired) falls back to
  a full re-sync; a version-number coincidence can never smuggle a
  stale delta through.
- **Crash safety**: the pin is written only after both apply commits
  land, and the apply is idempotent — deleting already-absent keys is
  a no-op and the upsert shadow-deletes its own keys — so a retry of a
  half-applied window converges instead of double-applying.

Contract: ``key_column`` uniquely identifies rows in the source (the
same contract ``upsert_rows`` has). The mirror must be managed by
replication only (its own writes would be shadowed by the next window).

Reference parity: the reference library has no incremental surface at
all (fhirflat/ingest.py re-reads whole datasets to refresh any derived
copy); the changelog-applied mirror is the cluster-native equivalent.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhirflat_spark import fsio

_STATE = "_REPLICATION.json"


def _state_path(dst: str) -> str:
    return f"{dst}/{_STATE}"


def read_replication_state(dst: str) -> dict | None:
    try:
        return json.loads(fsio.read_bytes(_state_path(dst)))
    except FileNotFoundError:
        return None


def _write_state(dst: str, state: dict) -> None:
    import os

    fsio.write_bytes_atomic(
        _state_path(dst), json.dumps(state).encode(), token=str(os.getpid())
    )


def _full_sync(spark: SparkSession, src: str, dst: str, key_column: str,
               cur: int, sha: str | None) -> dict:
    from fhirflat_spark.decode import decode_table
    from fhirflat_spark.sources.datasource import register

    register(spark)
    view = decode_table(spark, src, snapshot=cur)
    # REPLACE through the named sink: works for both a fresh mirror and
    # a reset re-sync, and keeps the mirror's own snapshot history when
    # the schema is unchanged
    view.write.format("fhirflat").mode("overwrite").save(dst)
    n = int(json.loads(fsio.read_bytes(f"{dst}/_SUMMARY.json")).get("rows") or 0)
    state = {"src_snapshot": cur, "src_sha": sha, "key_column": key_column}
    _write_state(dst, state)
    return {"mode": "full", "src_snapshot": cur, "rows": n,
            "inserts": n, "deletes": 0}


def replicate_table(spark: SparkSession, src: str, dst: str,
                    key_column: str,
                    rows_per_bucket: int = 250_000) -> dict:
    """Advance the mirror at ``dst`` to ``src``'s current snapshot.
    Returns {mode: full|incremental|noop, src_snapshot, inserts,
    deletes}."""
    from fhirflat_spark.changes import CHANGE_COL, table_changes
    from fhirflat_spark.encode import upsert_rows
    from fhirflat_spark.manifest import (
        current_snapshot,
        delete_rows,
        snapshot_dataset_sha,
    )

    cur = current_snapshot(src)
    if cur is None:
        raise ValueError(f"{src} has no committed snapshot")
    cur_sha = snapshot_dataset_sha(src, cur)
    state = read_replication_state(dst)
    if state is not None and state.get("key_column") != key_column:
        raise ValueError(
            f"mirror was built with key_column="
            f"{state.get('key_column')!r}, not {key_column!r}"
        )
    pinned = state["src_snapshot"] if state else None
    # lineage-identity check BEFORE the no-op fast path (same rule as
    # rollup/dedup-index): the pinned version must still carry the
    # pinned content sha, else the mirror's state has no delta
    # relationship to the new source lineage
    lineage_ok = (
        state is not None
        and state.get("src_sha") is not None
        and state["src_sha"] == snapshot_dataset_sha(src, pinned)
    )
    if lineage_ok and cur == pinned:
        return {"mode": "noop", "src_snapshot": cur,
                "inserts": 0, "deletes": 0}
    if not lineage_ok or cur < pinned:
        return _full_sync(spark, src, dst, key_column, cur, cur_sha)

    ch = table_changes(spark, src, pinned, cur).cache()
    try:
        ins = ch.where(F.col(CHANGE_COL) == "insert").drop(CHANGE_COL)
        del_keys = (
            ch.where(F.col(CHANGE_COL) == "delete")
            .select(key_column).distinct()
        )
        ins_keys = ins.select(key_column).distinct()
        # keys deleted WITHOUT a replacement row need an explicit delete;
        # updated keys are shadow-deleted by the upsert commit itself
        gone = del_keys.join(ins_keys, key_column, "left_anti")
        n_del = int(gone.count())
        n_ins = int(ins.count())
        if n_del:
            delete_rows(spark, dst, key_column, gone)
        if n_ins:
            upsert_rows(ins, dst, key_column,
                        rows_per_bucket=rows_per_bucket)
    finally:
        ch.unpersist()
    _write_state(dst, {"src_snapshot": cur, "src_sha": cur_sha,
                       "key_column": key_column})
    return {"mode": "incremental", "src_snapshot": cur,
            "inserts": n_ins, "deletes": n_del}
