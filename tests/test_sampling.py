"""Deterministic hash sampling (operators/sampling.py): membership must
be a pure function of (key, seed) — invariant under repartitioning,
aligned across tables, nested across fractions — with per-stratum rates
honored and the whole thing a codegen-side filter (no shuffle, no
Python)."""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest

from fhirflat_spark.operators.sampling import (
    mix_domains,
    mixture_thresholds,
    sample_hash,
    sample_stratified,
    split_column,
    stable_uniform,
    temperature_weights,
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


def _domains(spark, sizes: dict[str, int], parts=4):
    """One row per id with a skewed domain column: domain d covers a
    contiguous id range of len sizes[d]."""
    rows, base = [], 0
    for d, n in sorted(sizes.items()):
        rows.extend((base + i, d) for i in range(n))
        base += n
    return spark.createDataFrame(rows, ["k", "dom"]).repartition(parts)


def test_mixture_thresholds_exact_arithmetic():
    # W=6, M = min(8000*6//1, 500*6//2, 900*6//2, 700*6//1) = 1500
    counts = {"en": 8000, "fr": 500, "es": 900, "zh": 700, "de": 123}
    thr = mixture_thresholds(counts, {"en": 1, "fr": 2, "es": 2, "zh": 1})
    m = 1500
    assert thr == {
        "en": (1 * m << 32) // (6 * 8000),
        "fr": (2 * m << 32) // (6 * 500),   # == 2^32: kept whole
        "es": (2 * m << 32) // (6 * 900),
        "zh": (1 * m << 32) // (6 * 700),
    }
    assert thr["fr"] == 1 << 32
    assert "de" not in thr  # unweighted domain has no cutoff
    with pytest.raises(ValueError, match="no rows"):
        mixture_thresholds({"en": 10}, {"en": 1, "xx": 1})
    with pytest.raises(ValueError, match="positive ints"):
        mixture_thresholds({"en": 10}, {"en": 0})
    with pytest.raises(ValueError, match="positive ints"):
        mixture_thresholds({"en": 10}, {"en": 1.5})


def test_mix_domains_proportions_and_exhaustion(spark):
    sizes = {"web": 20_000, "books": 1_000, "code": 4_000, "junk": 500}
    df = _domains(spark, sizes)
    out = mix_domains(df, "dom", {"web": 2, "books": 1, "code": 1},
                      key_col="k", seed=5)
    per = {r["dom"]: r["c"] for r in
           out.groupBy("dom").agg(F.count("*").alias("c")).collect()}
    # W=4, M = min(20000*4//2, 1000*4//1, 4000*4//1) = 4000:
    # books is the scarcest weighted domain and survives WHOLE
    assert per["books"] == 1000
    # expected: web 2000 of 20000, code 1000 of 4000 (binomial ~4 sigma)
    assert abs(per["web"] - 2000) < 180
    assert abs(per["code"] - 1000) < 120
    assert "junk" not in per  # unweighted domain dropped


def test_mix_domains_deterministic_and_partition_invariant(spark):
    df = _domains(spark, {"a": 3000, "b": 600})
    w = {"a": 1, "b": 1}
    got1 = set(r["k"] for r in
               mix_domains(df, "dom", w, "k", seed=2).collect())
    got2 = set(r["k"] for r in
               mix_domains(df.repartition(13, "dom"), "dom", w, "k",
                           seed=2).collect())
    assert got1 == got2 and len(got1) > 0
    # membership is the documented pure function of (key, seed, counts)
    import hashlib
    thr = mixture_thresholds({"a": 3000, "b": 600}, w)
    rows = [(r["k"], r["dom"]) for r in df.collect()]
    expect = {
        k for k, d in rows if d in thr and
        int(hashlib.sha256(f"{k}:2".encode()).hexdigest()[:8], 16) < thr[d]
    }
    assert got1 == expect


def test_mix_domains_filter_stays_codegen(spark):
    df = _domains(spark, {"a": 200, "b": 100})
    plan = (
        mix_domains(df, "dom", {"a": 1, "b": 1}, "k", seed=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Filter" in plan


def test_temperature_weights():
    counts = {"en": 10_000, "fr": 100, "zh": 1}
    flat = temperature_weights(counts, 0.0)
    assert flat == {"en": 1_000_000, "fr": 1_000_000, "zh": 1_000_000}
    nat = temperature_weights(counts, 1.0)
    assert nat["en"] == 1_000_000 and nat["fr"] == 10_000 and nat["zh"] == 100
    half = temperature_weights(counts, 0.5)
    # sqrt flattening: fr moves from 1% of en to 10% of en
    assert half["fr"] == 100_000
    with pytest.raises(ValueError):
        temperature_weights({}, 0.5)
    with pytest.raises(ValueError):
        temperature_weights(counts, -1)


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
