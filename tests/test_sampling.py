"""Deterministic hash sampling (operators/sampling.py): membership must
be a pure function of (key, seed) — invariant under repartitioning,
aligned across tables, nested across fractions — with per-stratum rates
honored and the whole thing a codegen-side filter (no shuffle, no
Python)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fhirflat_spark.operators.sampling import (
    sample_hash,
    sample_stratified,
    split_column,
    stable_uniform,
)


def _keys(spark, n=10_000, parts=4):
    return spark.range(n, numPartitions=parts).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("g")
    )


def test_membership_invariant_under_partitioning(spark):
    df = _keys(spark)
    a = set(r["k"] for r in sample_hash(df, "k", 0.2, seed=1).collect())
    b = set(
        r["k"]
        for r in sample_hash(df.repartition(13, "g"), "k", 0.2, seed=1)
        .collect()
    )
    assert a == b and len(a) > 0


def test_fraction_accuracy(spark):
    n = 10_000
    got = sample_hash(_keys(spark, n), "k", 0.1, seed=3).count()
    assert abs(got / n - 0.1) < 0.02  # binomial 3-sigma ≈ 0.009


def test_seed_changes_membership(spark):
    df = _keys(spark, 2000)
    a = set(r["k"] for r in sample_hash(df, "k", 0.3, seed=1).collect())
    b = set(r["k"] for r in sample_hash(df, "k", 0.3, seed=2).collect())
    assert a != b
    assert abs(len(a & b) / 2000 - 0.09) < 0.03  # independent ≈ 0.3*0.3


def test_cross_table_alignment(spark):
    # two tables sampled by the same join key stay aligned
    left = _keys(spark, 5000)
    right = left.withColumn("payload", F.col("k") * 2)
    a = set(r["k"] for r in sample_hash(left, "k", 0.25, seed=9).collect())
    b = set(r["k"] for r in sample_hash(right, "k", 0.25, seed=9).collect())
    assert a == b


def test_split_is_nested_across_fractions(spark):
    df = _keys(spark, 5000)
    h10 = set(
        r["k"]
        for r in df.where(
            split_column("k", 0.10, seed="s") == "holdout"
        ).collect()
    )
    h25 = set(
        r["k"]
        for r in df.where(
            split_column("k", 0.25, seed="s") == "holdout"
        ).collect()
    )
    assert h10 <= h25  # growing the fraction only moves train→holdout
    assert len(h10) < len(h25)


def test_split_covers_every_row_exactly_once(spark):
    df = _keys(spark, 3000).withColumn(
        "split", split_column("k", 0.2, seed=0)
    )
    counts = {r["split"]: r["c"] for r in
              df.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert sum(counts.values()) == 3000
    assert set(counts) == {"train", "holdout"}


def test_stratified_rates(spark):
    df = _keys(spark, 9999)  # 3333 per stratum
    kept = sample_stratified(
        df, "k", "g", {0: 0.5, 1: 0.1}, default_fraction=0.0, seed=4
    )
    per = {r["g"]: r["c"] for r in
           kept.groupBy("g").agg(F.count("*").alias("c")).collect()}
    assert abs(per[0] / 3333 - 0.5) < 0.05
    assert abs(per[1] / 3333 - 0.1) < 0.03
    assert 2 not in per  # default 0.0: stratum dropped entirely


def test_null_keys_never_sampled(spark):
    df = spark.createDataFrame(
        [(None,), ("a",), ("b",)], ["k"]
    )
    out = sample_hash(df, "k", 1.0 - 1e-9, seed=0).collect()
    assert None not in {r["k"] for r in out}
    assert len(out) == 2


def test_sampling_plan_is_codegen_filter(spark):
    df = _keys(spark, 100)
    plan = (
        sample_hash(df, "k", 0.5, seed=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # "*(n)" prefixes = the operator runs inside WholeStageCodegen
    assert "*(1) Filter" in plan
