"""CNF WHERE (OR clauses) across the where mini-language consumers:
encoded-domain aggregates, encoded top-k, predicate DELETE/UPDATE and
the driver parser. An OR clause must evaluate branch-wise (OR of row
masks), prune only by its union range on a single column, void its
zone entirely when a null-test branch is present, and entail a
partition when any one branch does."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fhirflat_spark.decode import decode_table
from fhirflat_spark.encode import append_table, encode_table
from fhirflat_spark.encoded_exec import (
    _normalize_where,
    _where_zones,
    count_encoded,
    group_agg_encoded,
    group_count_encoded,
    topk_rows_encoded,
)


def _rows(df):
    return sorted(tuple(map(repr, r)) for r in df.collect())


def _frame(spark):
    rows = []
    rng = np.random.default_rng(11)
    for i in range(800):
        g = [None, "g0", "g1", "g2"][int(rng.integers(0, 4))]
        v = None if rng.integers(0, 5) == 0 else int(rng.integers(-50, 50))
        rows.append((i, g, v))
    return spark.createDataFrame(rows, "id BIGINT, grp STRING, val BIGINT")


def test_normalize_and_zones_unit():
    cnf = _normalize_where([("a", "eq", 1),
                            [("b", "ge", 2), ("c", "nu")],
                            ("d", "sw", "x")])
    assert cnf == [[("a", "eq", 1)],
                   [("b", "ge", 2), ("c", "nu", None)],
                   [("d", "sw", "x")]]
    # idempotent on already-normalized CNF
    assert _normalize_where(cnf) == cnf
    # nu branch voids the clause zone; same-column OR merges the union
    # range; cross-column OR bounds nothing
    assert _where_zones(cnf) == [("a", 1, 1), ("d", "x", "y")]
    assert _where_zones(_normalize_where(
        [[("a", "eq", 1), ("a", "ge", 5)]]
    )) == [("a", 1, None)]
    assert _where_zones(_normalize_where(
        [[("a", "in", (3, 7)), ("a", "eq", 20)]]
    )) == [("a", 3, 20)]
    assert _where_zones(_normalize_where(
        [[("a", "eq", 1), ("b", "eq", 2)]]
    )) == []
    with pytest.raises(ValueError, match="empty OR clause"):
        _normalize_where([[]])
    with pytest.raises(ValueError, match="where op"):
        _normalize_where([[("a", "between", 1)]])


def test_or_group_matches_spark(spark, tmp_path):
    df = _frame(spark)
    out = str(tmp_path / "ds")
    encode_table(df, out, rows_per_bucket=200)
    cases = [
        ([[("grp", "eq", "g1"), ("val", "ge", 40)]],
         "grp = 'g1' OR val >= 40"),
        ([[("grp", "eq", "g1"), ("grp", "eq", "g2")], ("val", "lt", 0)],
         "(grp = 'g1' OR grp = 'g2') AND val < 0"),
        ([[("val", "lt", -45), ("val", "nu", None)]],
         "val < -45 OR val IS NULL"),
        ([[("grp", "sw", "g0"), ("grp", "nu", None)], ("id", "ge", 100)],
         "(grp LIKE 'g0%' OR grp IS NULL) AND id >= 100"),
    ]
    for w, cond in cases:
        got = group_count_encoded(spark, out, "grp", where=w)
        exp = df.where(cond).groupBy("grp").agg(F.count("*").alias("cnt"))
        assert _rows(got) == _rows(exp), w
        gota = group_agg_encoded(spark, out, "grp", "val", where=w)
        expa = df.where(cond).groupBy("grp").agg(
            F.count("*").alias("cnt"),
            F.count("val").alias("count_val"),
            F.sum("val").alias("sum_val"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
        )
        assert _rows(gota) == _rows(expa), w


def test_or_null_branch_survives_zone_pruning(spark, tmp_path):
    """A clause like (val >= 1500 OR val IS NULL) must keep partitions
    whose val-zone misses [1500, ∞) but which hold NULL rows — the nu
    branch voids the clause's prune range."""
    out = str(tmp_path / "ds")
    lo = spark.range(0, 300).select(
        F.col("id"),
        F.when(F.col("id") % 3 == 0, None).otherwise(F.col("id"))
        .cast("bigint").alias("val"),
    )
    hi = spark.range(1000, 1300).select(
        F.col("id"), (F.col("id") + 500).cast("bigint").alias("val")
    )
    encode_table(lo, out, rows_per_bucket=300)
    append_table(hi, out, rows_per_bucket=300)
    w = [[("val", "ge", 1500), ("val", "nu", None)]]
    df = lo.unionByName(hi)
    exp = df.where("val >= 1500 OR val IS NULL").count()
    assert exp > 0
    assert count_encoded(spark, out, where=w) == exp
    # AND of the same preds still prunes to zero (sanity)
    assert count_encoded(
        spark, out, where=[("val", "ge", 1500), ("val", "nu", None)]
    ) == 0


def test_or_validation_inside_clause(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, float(i), "x") for i in range(40)],
        "id BIGINT, f DOUBLE, s STRING",
    )
    out = str(tmp_path / "ds")
    encode_table(df, out, rows_per_bucket=20)
    with pytest.raises(ValueError, match="string/integer/boolean"):
        group_count_encoded(spark, out, "s",
                            where=[[("id", "ge", 5), ("f", "eq", 3.0)]])
    with pytest.raises(ValueError, match="coerce"):
        group_count_encoded(spark, out, "s",
                            where=[[("s", "eq", "x"), ("id", "eq", "abc")]])


def test_topk_or_where_matches_spark(spark, tmp_path):
    df = spark.range(0, 4000).select(
        F.col("id"),
        (F.col("id") * 3).alias("val"),
        F.when(F.col("id") * 3 >= 6000, 1).otherwise(0).alias("half"),
        (F.col("id") % 2).alias("parity"),
    ).repartitionByRange(8, "val")
    out = str(tmp_path / "ds")
    encode_table(df, out, rows_per_bucket=500, shuffle=False)
    w = [[("half", "eq", 0), ("parity", "eq", 0)]]
    got = topk_rows_encoded(spark, out, "val", 10, "id", where=w)
    exp = (df.where("half = 0 OR parity = 0")
             .orderBy(F.col("val").desc_nulls_last(), F.col("id").asc())
             .select(*got.columns).limit(10))
    assert [tuple(r) for r in got.collect()] == \
           [tuple(r) for r in exp.collect()]
    # clause entailed through one branch on every top chunk still
    # yields a sound pruned answer: (half=1 OR parity=5) — half=1 is
    # chunk-homogeneous on this layout
    from fhirflat_spark.encoded_exec import _topk_zone_threshold

    tau = _topk_zone_threshold(out, "val", 10, None, True,
                               preds=[[("half", "eq", 1),
                                       ("parity", "eq", 5)]])
    assert tau is not None
    got = topk_rows_encoded(spark, out, "val", 10, "id",
                            where=[[("half", "eq", 1),
                                    ("parity", "eq", 5)]])
    exp = (df.where("half = 1 OR parity = 5")
             .orderBy(F.col("val").desc_nulls_last(), F.col("id").asc())
             .select(*got.columns).limit(10))
    assert [tuple(r) for r in got.collect()] == \
           [tuple(r) for r in exp.collect()]


def test_delete_where_or_both_tails(spark, tmp_path):
    from fhirflat_spark.maintenance import delete_where
    from fhirflat_spark.manifest import current_snapshot

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "lang", "source", "n_chars")
    out = str(tmp_path / "ds")
    ranged = docs.repartitionByRange(8, "n_chars").sortWithinPartitions(
        "n_chars"
    )
    encode_table(ranged, out, rows_per_bucket=2000, shuffle=False)
    pre = current_snapshot(out)
    hi = docs.approxQuantile("n_chars", [0.9], 0.0)[0]
    rep = delete_where(
        spark, out,
        [[("n_chars", "lt", 200), ("n_chars", "ge", int(hi))]],
    )
    # both tails of the range-clustered layout entail whole partitions
    assert rep["parts_dropped"], rep
    assert rep["snapshot"] == pre + 1
    exp = docs.where(~((F.col("n_chars") < 200)
                       | (F.col("n_chars") >= int(hi))))
    got = decode_table(spark, out).select("doc_id", "lang", "source",
                                          "n_chars")
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, exp.collect()))
    with pytest.raises(ValueError, match="not in dataset"):
        delete_where(spark, out, [[("nope", "eq", 1),
                                   ("n_chars", "lt", 0)]])


def test_update_where_or(spark, tmp_path):
    from fhirflat_spark.maintenance import update_where

    df = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3], i * 10) for i in range(300)],
        "id BIGINT, tag STRING, n BIGINT",
    )
    out = str(tmp_path / "ds")
    encode_table(df, out, rows_per_bucket=100)
    rep = update_where(
        spark, out,
        [[("tag", "eq", "a"), ("n", "ge", 2900)]],
        {"n": "n + 1"},
    )
    exp = df.withColumn(
        "n", F.when((F.col("tag") == "a") | (F.col("n") >= 2900),
                    F.col("n") + 1).otherwise(F.col("n"))
    )
    got = decode_table(spark, out).select("id", "tag", "n")
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, exp.collect()))
    assert rep["rows_updated"] == df.where(
        "tag = 'a' OR n >= 2900"
    ).count()


def test_driver_parse_where_pipe():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "driver_mod", "/root/repo/driver.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod._parse_where("lang=en|n_chars<100,source=web") == [
        [("lang", "eq", "en"), ("n_chars", "lt", 100)],
        ("source", "eq", "web"),
    ]
    assert mod._parse_where("a>=5") == [("a", "ge", 5)]
    with pytest.raises(SystemExit):
        mod._parse_where("a>=5|")
    # temporal literals auto-type; quoting forces a string
    import datetime as dt

    assert mod._parse_where("ts>=2024-01-10") == \
        [("ts", "ge", dt.date(2024, 1, 10))]
    assert mod._parse_where("ts<2024-01-10 12:30:00") == \
        [("ts", "lt", dt.datetime(2024, 1, 10, 12, 30))]
    assert mod._parse_where("s='2024-01-10'") == \
        [("s", "eq", "2024-01-10")]
