"""shuffle_shards: deterministic global training shuffle — shard and
within-shard order are pure functions of (key, seed)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fhirflat_spark.operators.sampling import shuffle_shards


def _frame(spark, n=2000):
    return spark.range(0, n).select(F.col("id").alias("k"),
                                    (F.col("id") * 7).alias("v"))


def test_assignment_is_partitioning_invariant(spark):
    df = _frame(spark)
    a = shuffle_shards(df, "k", 16, seed=3, with_position=True)
    b = shuffle_shards(df.repartition(13), "k", 16, seed=3,
                       with_position=True)
    rows = lambda d: sorted(map(tuple, d.select("k", "shard",
                                                "shard_pos").collect()))
    assert rows(a) == rows(b)


def test_shards_in_range_and_balanced(spark):
    got = shuffle_shards(_frame(spark), "k", 16, seed=1)
    counts = {r["shard"]: r["c"] for r in
              got.groupBy("shard").agg(F.count("*").alias("c")).collect()}
    assert set(counts) <= set(range(16))
    # 2000 rows over 16 shards: expect 125 each; hash uniformity keeps
    # every shard within a generous band
    assert all(60 <= c <= 200 for c in counts.values()), counts


def test_positions_dense_per_shard(spark):
    got = shuffle_shards(_frame(spark), "k", 8, seed=2,
                         with_position=True)
    per = got.groupBy("shard").agg(
        F.count("*").alias("n"), F.min("shard_pos").alias("lo"),
        F.max("shard_pos").alias("hi"),
        F.count_distinct("shard_pos").alias("d"),
    ).collect()
    for r in per:
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1 and r["d"] == r["n"]


def test_seed_changes_order_not_membership_structure(spark):
    df = _frame(spark)
    a = shuffle_shards(df, "k", 8, seed="a", with_position=True)
    b = shuffle_shards(df, "k", 8, seed="b", with_position=True)
    ra = sorted(map(tuple, a.select("k", "shard", "shard_pos").collect()))
    rb = sorted(map(tuple, b.select("k", "shard", "shard_pos").collect()))
    assert ra != rb  # different seed = a different shuffle
    # same seed = the identical shuffle
    a2 = shuffle_shards(df, "k", 8, seed="a", with_position=True)
    assert ra == sorted(map(tuple,
                            a2.select("k", "shard", "shard_pos").collect()))


def test_null_keys_unassigned(spark):
    df = spark.createDataFrame([(None,), ("x",), ("y",)], "k STRING")
    got = shuffle_shards(df, "k", 4, seed=0, with_position=True).collect()
    by_k = {r["k"]: (r["shard"], r["shard_pos"]) for r in got}
    assert by_k[None] == (None, None)
    assert all(v[0] is not None and v[1] is not None
               for k, v in by_k.items() if k is not None)


def test_bad_n_shards(spark):
    with pytest.raises(ValueError, match="n_shards"):
        shuffle_shards(_frame(spark), "k", 0)
