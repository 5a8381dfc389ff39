"""Temporal zone maps: NTZ-timestamp and date columns record epoch-int
zone bounds (micros / days) so time-clustered retention DELETEs drop
whole partitions metadata-only, and scans prune on time predicates.
Type-directed literal conversion guards the unit mismatch (a datetime
literal against a DATE column's day-zones must decline, never compare
micros to days); tz-aware timestamp columns stay zoneless (their wall-
clock interpretation is session state, not data)."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from fhirflat_spark.encode import _zone_bounds, encode_table
from fhirflat_spark.maintenance import delete_where
from fhirflat_spark.manifest import coerce_zone_bound

EPOCH = dt.datetime(1970, 1, 1)


def test_zone_bounds_temporal_units():
    arr = pa.array([dt.datetime(2024, 1, 1), dt.datetime(2024, 6, 1)],
                   type=pa.timestamp("us"))
    lo, hi = _zone_bounds(arr)
    assert lo == int((dt.datetime(2024, 1, 1) - EPOCH).total_seconds()) \
        * 1_000_000
    assert hi == int((dt.datetime(2024, 6, 1) - EPOCH).total_seconds()) \
        * 1_000_000
    d = pa.array([dt.date(2024, 1, 1), dt.date(2024, 6, 1)],
                 type=pa.date32())
    lo, hi = _zone_bounds(d)
    assert lo == (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days
    assert hi == (dt.date(2024, 6, 1) - dt.date(1970, 1, 1)).days
    # tz-aware: wall-clock meaning is session state → no zone
    aware = pa.array([dt.datetime(2024, 1, 1)], type=pa.timestamp("us",
                                                                  tz="UTC"))
    assert _zone_bounds(aware) is None


def test_coerce_zone_bound_temporal():
    from pyspark.sql import types as T

    ntz, date, tz = T.TimestampNTZType(), T.DateType(), T.TimestampType()
    micros = 86_400_000_000
    assert coerce_zone_bound(ntz, micros) == micros
    assert coerce_zone_bound(ntz, dt.datetime(1970, 1, 2)) == micros
    assert coerce_zone_bound(date, 5) == 5
    assert coerce_zone_bound(date, dt.date(1970, 1, 6)) == 5
    # unit-mismatch guards: wrong literal family declines (None)
    assert coerce_zone_bound(date, dt.datetime(1970, 1, 6)) is None
    assert coerce_zone_bound(ntz, dt.date(1970, 1, 6)) is None
    # tz-aware literals/columns decline
    aware = dt.datetime(1970, 1, 2, tzinfo=dt.timezone.utc)
    assert coerce_zone_bound(ntz, aware) is None
    assert coerce_zone_bound(tz, micros) is None


@pytest.fixture()
def ts_clustered(spark, tmp_path):
    """2000 events range-clustered on an NTZ timestamp: whole
    partitions fall before the retention cutoff."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.range(0, 2000).select(
        F.col("id"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 3600)
        .cast("timestamp_ntz").alias("ts"),
        (F.col("id") % 10).alias("k"),
    )
    out = str(tmp_path / "ds")
    encode_table(df.repartitionByRange(8, "ts").sortWithinPartitions("ts"),
                 out, rows_per_bucket=250, shuffle=False)
    return out, df


def test_retention_delete_drops_partitions_metadata_only(
    spark, ts_clustered
):
    out, df = ts_clustered
    cutoff = dt.datetime(1970, 1, 1) + dt.timedelta(
        seconds=1_700_000_000 + 777 * 3600
    )
    rep = delete_where(spark, out, ("ts", "lt", cutoff))
    # the time-clustered layout must exercise the metadata-drop tier
    assert rep["parts_dropped"], rep
    assert rep["n_positions"] > 0, rep  # and the straddler tier
    from fhirflat_spark.decode import decode_table

    got = sorted(
        (r["id"], r["ts"]) for r in
        decode_table(spark, out).select("id", "ts").collect()
    )
    exp = sorted(
        (r["id"], r["ts"]) for r in
        df.where(F.col("ts") >= F.lit(cutoff)).select("id", "ts").collect()
    )
    assert got == exp


def test_datasource_scan_prunes_on_ts(spark, ts_clustered):
    """The named source with a pushed ts range returns exactly the
    matching rows (zone pruning + Spark residual compose)."""
    from fhirflat_spark.sources.datasource import register

    register(spark)
    out, df = ts_clustered
    lo = dt.datetime(1970, 1, 1) + dt.timedelta(
        seconds=1_700_000_000 + 1990 * 3600
    )
    got = (
        spark.read.format("fhirflat").option("path", out).load()
        .where(F.col("ts") >= F.lit(lo))
        .select("id").collect()
    )
    exp = df.where(F.col("ts") >= F.lit(lo)).select("id").collect()
    assert sorted(r["id"] for r in got) == sorted(r["id"] for r in exp)


def test_date_column_delete_and_mismatch_guard(spark, tmp_path):
    df = spark.range(0, 800).select(
        F.col("id"),
        F.date_add(F.lit(dt.date(2024, 1, 1)),
                   (F.col("id") / 4).cast("int")).alias("d"),
    )
    out = str(tmp_path / "ds")
    encode_table(df.repartitionByRange(4, "d").sortWithinPartitions("d"),
                 out, rows_per_bucket=200, shuffle=False)
    rep = delete_where(spark, out, ("d", "lt", dt.date(2024, 4, 1)))
    assert rep["parts_dropped"], rep
    from fhirflat_spark.decode import decode_table

    assert decode_table(spark, out).count() == \
        df.where(F.col("d") >= F.lit(dt.date(2024, 4, 1))).count()


def test_encoded_aggregates_on_time_windows(spark, ts_clustered):
    """Time-window predicates run in the encoded domain: the tiered
    COUNT answers a retention count mostly from metadata on ts-
    clustered data, and grouped aggregates match Spark exactly."""
    from fhirflat_spark.encoded_exec import (
        count_encoded,
        group_count_encoded,
        sum_encoded,
    )

    out, df = ts_clustered
    cutoff = dt.datetime(1970, 1, 1) + dt.timedelta(
        seconds=1_700_000_000 + 777 * 3600
    )
    rep: dict = {}
    got = count_encoded(spark, out, where=("ts", "ge", cutoff),
                        report=rep)
    assert got == df.where(F.col("ts") >= F.lit(cutoff)).count()
    assert rep["parts_metadata"] > 0  # temporal zones entail partitions
    assert sum_encoded(spark, out, "id", where=("ts", "ge", cutoff)) == \
        df.where(F.col("ts") >= F.lit(cutoff)).agg(
            F.sum("id")).collect()[0][0]
    gotg = {r["k"]: r["cnt"] for r in group_count_encoded(
        spark, out, "k", where=("ts", "ge", cutoff)).collect()}
    expg = {r["k"]: r["cnt"] for r in
            df.where(F.col("ts") >= F.lit(cutoff)).groupBy("k")
            .agg(F.count("*").alias("cnt")).collect()}
    assert gotg == expg
    # CNF composes: (ts window OR high id) AND k filter
    w = [[("ts", "lt", cutoff), ("id", "ge", 1990)], ("k", "eq", 3)]
    assert count_encoded(spark, out, where=w) == df.where(
        ((F.col("ts") < F.lit(cutoff)) | (F.col("id") >= 1990))
        & (F.col("k") == 3)
    ).count()


def test_encoded_temporal_refusals(spark, ts_clustered):
    from fhirflat_spark.encoded_exec import count_encoded

    out, _df = ts_clustered
    aware = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    with pytest.raises(ValueError, match="temporal family"):
        count_encoded(spark, out, where=("ts", "ge", aware))
    with pytest.raises(ValueError, match="IN-list"):
        count_encoded(spark, out,
                      where=("ts", "in", (dt.date(2024, 1, 1),)))


def test_encoded_date_column_refuses_datetime(spark, tmp_path):
    from fhirflat_spark.encoded_exec import count_encoded

    df = spark.range(0, 100).select(
        F.col("id"),
        F.date_add(F.lit(dt.date(2024, 1, 1)),
                   F.col("id").cast("int")).alias("d"),
    )
    out = str(tmp_path / "ds")
    encode_table(df, out, rows_per_bucket=50)
    with pytest.raises(ValueError, match="temporal family"):
        count_encoded(spark, out, where=("d", "lt",
                                         dt.datetime(2024, 2, 1)))
    # date literals work and match Spark
    assert count_encoded(
        spark, out, where=("d", "lt", dt.date(2024, 2, 1))
    ) == df.where(F.col("d") < F.lit(dt.date(2024, 2, 1))).count()


def test_datetime_literal_on_date_column_never_entails(spark, tmp_path):
    """A datetime literal against a DATE column's day-zones must never
    compare micros to days: entailment declines, the Spark residual
    still answers exactly."""
    df = spark.range(0, 400).select(
        F.col("id"),
        F.date_add(F.lit(dt.date(2024, 1, 1)),
                   (F.col("id") / 4).cast("int")).alias("d"),
    )
    out = str(tmp_path / "ds")
    encode_table(df.repartitionByRange(4, "d").sortWithinPartitions("d"),
                 out, rows_per_bucket=100, shuffle=False)
    # 1970-era datetime: if days were compared to micros every zone
    # would look entailed and the whole table would drop
    rep = delete_where(spark, out,
                       ("d", "lt", dt.datetime(1970, 1, 6)))
    assert not rep["parts_dropped"]
    from fhirflat_spark.decode import decode_table

    # Spark semantics: date < 1970 datetime is false for every row
    assert decode_table(spark, out).count() == 400


def test_timebucket_encoded_matches_date_trunc(spark, tmp_path):
    from fhirflat_spark.encoded_exec import group_timebucket_encoded

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df = df.withColumn(
        "ts", F.when(F.col("event_id") % 50 == 0, None)
        .otherwise(F.col("ts"))
    )
    out = str(tmp_path / "ds")
    encode_table(df.repartitionByRange(4, "ts").sortWithinPartitions("ts"),
                 out, rows_per_bucket=300, shuffle=False)

    def rows(d):
        return sorted(map(tuple, d.collect()), key=repr)

    for b in ("minute", "hour", "day", "week"):
        got = rows(group_timebucket_encoded(spark, out, "ts", b))
        exp = rows(
            df.groupBy(F.date_trunc(b, "ts").alias("bucket"))
            .agg(F.count("*").alias("cnt"))
        )
        assert got == exp, b
    # WHERE composes; NULL ts rows group under the NULL bucket
    got = rows(group_timebucket_encoded(
        spark, out, "ts", "day", where=("event_type", "eq", "click")
    ))
    exp = rows(
        df.where("event_type = 'click'")
        .groupBy(F.date_trunc("day", "ts").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )
    assert got == exp


def test_timebucket_refusals(spark, tmp_path):
    from fhirflat_spark.encoded_exec import group_timebucket_encoded

    df = spark.range(0, 50).select(
        F.col("id"),
        F.timestamp_seconds(F.col("id") * 3600).alias("lt"),  # session-tz
    )
    out = str(tmp_path / "ds")
    encode_table(df, out, rows_per_bucket=50)
    with pytest.raises(ValueError, match="TIMESTAMP_NTZ"):
        group_timebucket_encoded(spark, out, "lt", "day")
    with pytest.raises(ValueError, match="bucket"):
        group_timebucket_encoded(spark, out, "lt", "month")
