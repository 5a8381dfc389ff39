"""Continuous time-bucket rollups over the chunk store — the
TimescaleDB continuous-aggregate / hypertable-rollup analog (the third
of the brief's "custom operators Spark lacks": as-of join, range join,
hypertable rollup).

A rollup is a materialized per-(time bucket, dims) aggregate of a chunk
-store table, pinned to the table SNAPSHOT it covers. ``build_rollup``
computes it once from the full table; ``refresh_rollup`` advances it to
the current snapshot by aggregating only the snapshot CHANGELOG
(``changes.table_changes`` — IO ∝ the delta for append/delete windows)
and merging signed per-bucket deltas into the stored state: inserts add,
deletes (an upsert's pre-images included) subtract, buckets whose count
reaches zero drop out. At 100 TB this is the only viable maintenance
strategy — a dashboard aggregate must not re-scan the table per refresh.

Only abelian-group aggregates refresh this way (count, sum — mean =
sum/count at read time). min/max are not delta-maintainable under
deletes; use integer-typed measures (e.g. cents) when bit-exact
refresh-vs-recompute equality matters, since float sums accumulate
rounding differences under subtraction.

Refresh is crash-safe the same way the table is: each state is written
to a fresh ``v{N}`` directory and the metadata pointer flips atomically
afterwards — a reader (or a crashed refresh retry) sees the old
consistent state or the new one, never a half-merged table.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fhirflat_spark import fsio

_META = "rollup.json"


def _meta_path(rollup_dir: str) -> str:
    return f"{rollup_dir}/{_META}"


def _agg(df: DataFrame, meta: dict, sign_col: str | None = None) -> DataFrame:
    sign = F.col(sign_col) if sign_col else F.lit(1)
    aggs = [F.sum(sign).cast("long").alias("n")] + [
        F.sum(sign * F.col(c)).alias(f"{c}_sum") for c in meta["sum_cols"]
    ]
    # date_trunc implicitly widens TIMESTAMP_NTZ to session-tz TIMESTAMP;
    # cast back to the source column's flavor so the bucket type is the
    # table's, not the session's (and a delta refresh built under a
    # different session tz merges on equal keys)
    bucket = F.date_trunc(meta["bucket"], F.col(meta["ts_col"])).cast(
        df.schema[meta["ts_col"]].dataType
    )
    return df.groupBy(
        bucket.alias("bucket"), *meta["group_cols"]
    ).agg(*aggs)


def build_rollup(
    spark: SparkSession,
    table_dir: str,
    rollup_dir: str,
    ts_col: str,
    bucket: str = "hour",
    group_cols: tuple | list = (),
    sum_cols: tuple | list = (),
) -> dict:
    """Materialize the rollup from the table's CURRENT snapshot (the one
    full scan this rollup will ever need)."""
    from fhirflat_spark.decode import decode_table
    from fhirflat_spark.manifest import current_snapshot

    v = current_snapshot(table_dir)
    if v is None:
        raise ValueError(f"{table_dir} has no committed snapshot")
    df = decode_table(spark, table_dir)
    for c in (ts_col, *group_cols, *sum_cols):
        if c not in df.columns:
            raise ValueError(
                f"rollup column {c!r} not in table columns {df.columns}"
            )
    from fhirflat_spark.manifest import snapshot_dataset_sha

    meta = {
        "snapshot": v,
        "ts_col": ts_col,
        "bucket": bucket,
        "group_cols": list(group_cols),
        "sum_cols": list(sum_cols),
        # content sha of the pinned snapshot: refresh rebuilds instead
        # of merging a delta computed on a RESET lineage that happens to
        # reuse (and later pass) this version number
        "snapshot_sha": snapshot_dataset_sha(table_dir, v),
    }
    _agg(df, meta).write.mode("overwrite").parquet(f"{rollup_dir}/v{v}")
    fsio.write_bytes_atomic(
        _meta_path(rollup_dir), json.dumps(meta).encode(),
        token=str(os.getpid()),
    )
    return meta


def read_rollup(spark: SparkSession, rollup_dir: str) -> DataFrame:
    meta = json.loads(fsio.read_bytes(_meta_path(rollup_dir)))
    return spark.read.parquet(f"{rollup_dir}/v{meta['snapshot']}")


def refresh_rollup(
    spark: SparkSession, table_dir: str, rollup_dir: str,
    keep_old: bool = False,
) -> dict:
    """Advance the rollup to the table's current snapshot by merging the
    changelog's signed per-bucket deltas — never re-scanning data the
    window didn't touch. No-op when already current. A history RESET
    (rollback below the pinned version, compaction swap, fresh
    re-encode — detected via snapshot regression or a changed content
    sha at the pinned version) falls back to a full rebuild: the stored
    state has no delta relationship to the new lineage. ``keep_old``
    leaves the previous state directory for time-travel reads."""
    from fhirflat_spark.changes import CHANGE_COL, table_changes
    from fhirflat_spark.manifest import current_snapshot, snapshot_dataset_sha

    meta = json.loads(fsio.read_bytes(_meta_path(rollup_dir)))
    frm, to = meta["snapshot"], current_snapshot(table_dir)
    # lineage-identity check BEFORE the no-op fast path: a history reset
    # (fresh re-encode / compaction swap) that advances to exactly the
    # pinned version number would otherwise return the stale rollup —
    # to == frm only proves the version NUMBER matches, not the content
    lineage_ok = (
        "snapshot_sha" not in meta
        or meta["snapshot_sha"] == snapshot_dataset_sha(table_dir, frm)
    )
    if to == frm and lineage_ok:
        return meta
    if to is None or to < frm or to == frm or not lineage_ok:
        old = f"{rollup_dir}/v{frm}"
        meta = build_rollup(
            spark, table_dir, rollup_dir, meta["ts_col"],
            bucket=meta["bucket"], group_cols=meta["group_cols"],
            sum_cols=meta["sum_cols"],
        )
        if not keep_old and frm != meta["snapshot"]:
            fsio.delete_dir(old)
        return meta
    ch = table_changes(spark, table_dir, frm, to).withColumn(
        "__sign",
        F.when(F.col(CHANGE_COL) == "insert", F.lit(1)).otherwise(F.lit(-1)),
    )
    delta = _agg(ch, meta, sign_col="__sign")
    old = spark.read.parquet(f"{rollup_dir}/v{frm}")
    keys = ["bucket", *meta["group_cols"]]
    merged = (
        old.unionByName(delta)
        .groupBy(*keys)
        .agg(
            F.sum("n").alias("n"),
            *[
                F.sum(f"{c}_sum").alias(f"{c}_sum")
                for c in meta["sum_cols"]
            ],
        )
        .where(F.col("n") > 0)
    )
    merged.write.mode("overwrite").parquet(f"{rollup_dir}/v{to}")
    new_meta = {**meta, "snapshot": to,
                "snapshot_sha": snapshot_dataset_sha(table_dir, to)}
    fsio.write_bytes_atomic(
        _meta_path(rollup_dir), json.dumps(new_meta).encode(),
        token=str(os.getpid()),
    )
    if not keep_old:
        fsio.delete_dir(f"{rollup_dir}/v{frm}")
    return new_meta
