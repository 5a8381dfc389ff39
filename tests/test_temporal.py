"""As-of join and banded range join (operators/temporal.py): semantics
against hand-built fixtures (inclusive/strict bounds, LEFT nulls,
window-edge pairs) and plan shape (banded equi-join, never a
nested-loop; no per-row Python)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from fhirflat_spark.operators.temporal import asof_join, range_join

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(sec):
    return T0 + dt.timedelta(seconds=sec)


def _quotes(spark):
    # key, ts, px
    rows = [
        ("a", _ts(0), 1.0),
        ("a", _ts(10), 2.0),
        ("a", _ts(20), 3.0),
        ("b", _ts(5), 10.0),
    ]
    return spark.createDataFrame(rows, ["sym", "ts", "px"])


def _trades(spark):
    rows = [
        ("a", _ts(10), 100),   # exactly on a quote ts
        ("a", _ts(15), 101),   # between quotes
        ("a", _ts(-5), 102),   # before any quote
        ("b", _ts(60), 103),
        ("c", _ts(30), 104),   # key with no quotes at all
    ]
    return spark.createDataFrame(rows, ["sym", "ts", "qty"])


def test_asof_inclusive_backward(spark):
    out = asof_join(
        _trades(spark), _quotes(spark), on="sym", ts="ts",
        right_cols=["px"],
    )
    got = {r["qty"]: (r["asof_px"], r["asof_ts"]) for r in out.collect()}
    assert got[100] == (2.0, _ts(10))   # ts == quote ts: inclusive
    assert got[101] == (2.0, _ts(10))   # latest earlier quote
    assert got[102] == (None, None)     # nothing at-or-before
    assert got[103] == (10.0, _ts(5))
    assert got[104] == (None, None)     # unmatched key keeps LEFT row


def test_asof_strict_excludes_equal_ts(spark):
    out = asof_join(
        _trades(spark), _quotes(spark), on="sym", ts="ts",
        right_cols=["px"], strict=True,
    )
    got = {r["qty"]: r["asof_px"] for r in out.collect()}
    assert got[100] == 1.0  # the ts-10 quote no longer visible at ts 10
    assert got[101] == 2.0


def test_asof_preserves_left_multiplicity_and_columns(spark):
    trades = _trades(spark).withColumn("note", F.lit("x"))
    out = asof_join(trades, _quotes(spark), on="sym", ts="ts",
                    right_cols=["px"])
    assert out.count() == trades.count()
    assert out.columns == ["sym", "ts", "qty", "note", "asof_ts", "asof_px"]


def test_range_join_window_edges(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(0))], ["id", "user", "ts"]
    )
    right = spark.createDataFrame(
        [
            (10, "u", _ts(30)),    # exactly at the bound: included
            (11, "u", _ts(31)),    # just outside
            (12, "u", _ts(-30)),   # bound on the other side
            (13, "v", _ts(0)),     # other key
        ],
        ["id", "user", "ts"],
    )
    out = range_join(left, right, on="user", ts="ts", window_sec=30)
    assert sorted(r["b_id"] for r in out.collect()) == [10, 12]


def test_range_join_emits_each_pair_once(spark):
    # rows spread across bins, incl. same-bin and adjacent-bin pairs
    rows = [(i, "u", _ts(i * 7)) for i in range(40)]
    df = spark.createDataFrame(rows, ["id", "user", "ts"])
    out = (
        range_join(df, df, on="user", ts="ts", window_sec=20)
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
    )
    got = sorted((r["a_id"], r["b_id"]) for r in out.collect())
    expect = sorted(
        (i, j)
        for i in range(40)
        for j in range(i + 1, 40)
        if abs(i - j) * 7 <= 20
    )
    assert got == expect  # no duplicate probes, no dropped edges


def test_temporal_plans_stay_jvm_side(spark):
    ev = spark.range(100).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 100).alias("ts"),
        F.col("id").cast("double").alias("value"),
    )
    a = asof_join(ev, ev, on="user_id", ts="ts", right_cols=["value"])
    r = range_join(ev, ev, on="user_id", ts="ts", window_sec=500)
    for df in (a, r):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoop" not in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
