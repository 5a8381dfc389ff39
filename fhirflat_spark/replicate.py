"""CDF-driven incremental table replication (mirror maintenance).

``replicate_table(spark, src, dst, key_column)`` keeps an encoded table
``dst`` equal to the current view of ``src`` by applying snapshot-log
deltas instead of recopying — the ops tool behind "mirror the curated
table to the serving / training cluster":

- **First call** (or after a source history RESET): full sync —
  decode the source's current view and REPLACE the mirror through the
  named sink.
- **Steady state**: the window's delta is applied as ONE snapshot
  commit — the appended insert rows plus a scoped equality-delete
  entry carrying both the shadow keys and the keys deleted without
  replacement (atomic: a mirror reader never sees a half-applied
  window; nothing data-sized touches the driver). The delta itself
  comes from a METADATA-fast plan when the window only appended
  partitions and key-column equality deletes (inserts = the new
  part-ids decoded under current visibility, delete keys = the new
  key files read verbatim — no pre-image decode at all); positional /
  foreign-column deletes and rewound or compacted windows above the
  pin fall back to the general changelog (``table_changes``), still
  incremental. Cost ∝ the delta, never the table.
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

- **Transformed mirrors** (incremental materialized view): ``where=``
  keeps only rows matching a SQL predicate, ``columns=`` projects the
  mirror down to a column subset (must retain ``key_column``). The
  delta apply handles predicate FLIPS: an update that moves a row out
  of the predicate deletes its key from the mirror, one that moves it
  in upserts it — so the mirror always equals
  ``SELECT columns FROM source WHERE predicate``. A changed
  ``where``/``columns`` definition is a different view: replicate
  detects the mismatch against the stored state and full-syncs under
  the new definition.

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


def _make_view(key_column: str, where: str | None, columns):
    if columns is not None and key_column not in columns:
        raise ValueError(
            f"columns= must retain the key column {key_column!r} "
            "(row identity in the mirror)"
        )

    def view(df: DataFrame) -> DataFrame:
        if where is not None:
            df = df.where(where)
        if columns is not None:
            df = df.select(*columns)
        return df

    return view


def _full_sync(spark: SparkSession, src: str, dst: str, key_column: str,
               cur: int, sha: str | None, where, columns, view) -> dict:
    from fhirflat_spark.decode import decode_table
    from fhirflat_spark.sources.datasource import register

    register(spark)
    # REPLACE through the named sink: works for both a fresh mirror and
    # a reset re-sync, and keeps the mirror's own snapshot history when
    # the schema is unchanged
    view(decode_table(spark, src, snapshot=cur)) \
        .write.format("fhirflat").mode("overwrite").save(dst)
    n = int(json.loads(fsio.read_bytes(f"{dst}/_SUMMARY.json")).get("rows") or 0)
    _write_state(dst, {"src_snapshot": cur, "src_sha": sha,
                       "key_column": key_column,
                       "where": where, "columns": columns})
    return {"mode": "full", "src_snapshot": cur, "rows": n,
            "inserts": n, "deletes": 0}


def _window_delta(spark: SparkSession, src: str, frm: int, to: int,
                  key_column: str):
    """(inserts_df, delete_keys_df) for the window, METADATA-fast, or
    None when the shape doesn't allow it (caller falls back to
    ``table_changes``). The difference from the changelog's fast path:
    replication never needs delete PRE-IMAGES — only the key values,
    which sit verbatim in the window's new equality-delete key files —
    so the delete side is a key-file read instead of a scoped decode of
    every partition the fence covers (for uniformly scattered keys,
    that scoped decode is the whole table). Inserts are the new
    part-ids decoded under snapshot-``to`` visibility, so rows
    inserted-then-deleted within the window are already masked out.
    Bails (returns None) on: history rewrites, positional deletes,
    delete entries keyed on a different column, and any delete fence
    that does not sit above every pre-window partition."""
    from fhirflat_spark.decode import decode_table
    from fhirflat_spark.manifest import (
        active_delete_files,
        snapshot_part_ids,
    )

    a_parts = set(snapshot_part_ids(src, frm))
    b_parts = set(snapshot_part_ids(src, to))
    a_del = active_delete_files(src, frm)
    b_del = active_delete_files(src, to)
    monotonic = a_parts <= b_parts and (
        [e["file"] for e in b_del][: len(a_del)]
        == [e["file"] for e in a_del]
    )
    if not monotonic:
        return None
    new_entries = b_del[len(a_del):]
    top = max(a_parts) if a_parts else -1
    for e in new_entries:
        below = e.get("below_part")
        if e["column"] != key_column or (below is not None and below <= top):
            return None
    new_parts = sorted(b_parts - a_parts)
    ins = (
        decode_table(spark, src, part_ids=new_parts, snapshot=to)
        if new_parts
        else decode_table(spark, src, snapshot=to).limit(0)
    )
    del_keys = (
        spark.read.parquet(
            *[f"{src}/deletes/{e['file']}" for e in new_entries]
        ).select(key_column).distinct()
        if new_entries
        else ins.select(key_column).limit(0)
    )
    return ins, del_keys


def replicate_table(spark: SparkSession, src: str, dst: str,
                    key_column: str,
                    rows_per_bucket: int = 250_000,
                    where: str | None = None,
                    columns: list[str] | None = None) -> dict:
    """Advance the mirror at ``dst`` to ``src``'s current snapshot
    (optionally the ``where``-filtered, ``columns``-projected view of
    it). Returns {mode: full|incremental|noop, src_snapshot, inserts,
    deletes}."""
    from fhirflat_spark.changes import CHANGE_COL, table_changes
    from fhirflat_spark.encode import append_table
    from fhirflat_spark.manifest import (
        current_snapshot,
        delete_rows,
        snapshot_dataset_sha,
    )

    columns = list(columns) if columns is not None else None
    view = _make_view(key_column, where, columns)
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
    if state is not None and (state.get("where") != where
                              or state.get("columns") != columns):
        # a different view definition — the stored rows don't satisfy
        # it, so a delta has nothing correct to apply onto
        state = None
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
        return _full_sync(spark, src, dst, key_column, cur, cur_sha,
                          where, columns, view)

    delta = _window_delta(spark, src, pinned, cur, key_column)
    if delta is not None:
        ins_all, del_keys = delta
        ch = ins_all.cache()
    else:
        # window shape the key-file path can't serve (positional or
        # foreign-column deletes, rewritten history): derive both sides
        # from the general changelog
        ch = table_changes(spark, src, pinned, cur).cache()
        ins_all = ch.where(F.col(CHANGE_COL) == "insert").drop(CHANGE_COL)
        del_keys = (
            ch.where(F.col(CHANGE_COL) == "delete")
            .select(key_column).distinct()
        )
    try:
        ins = view(ins_all)
        # any key the window TOUCHED whose final image does not land in
        # the view must be deleted from the mirror: keys deleted without
        # a replacement row, plus updates whose new values flipped OUT
        # of the predicate; keys that do land are shadow-deleted by the
        # upsert commit itself
        touched = del_keys.unionByName(
            ins_all.select(key_column).distinct()
        ).distinct()
        gone = touched.join(ins.select(key_column).distinct(),
                            key_column, "left_anti")
        n_del = int(gone.count())
        n_ins = int(ins.count())
        if n_ins:
            # ONE snapshot commit for the whole window: the scoped
            # equality-delete entry carries the upsert's shadow keys AND
            # the gone keys, atomic with the appended rows — a mirror
            # reader never observes a half-applied window
            shadow = ins.select(key_column).distinct()
            if n_del:
                shadow = shadow.unionByName(gone).distinct()
            append_table(ins, dst, rows_per_bucket=rows_per_bucket,
                         delete_keys=(key_column, shadow))
        elif n_del:
            delete_rows(spark, dst, key_column, gone)
    finally:
        ch.unpersist()
    _write_state(dst, {"src_snapshot": cur, "src_sha": cur_sha,
                       "key_column": key_column,
                       "where": where, "columns": columns})
    return {"mode": "incremental", "src_snapshot": cur,
            "inserts": n_ins, "deletes": n_del}
