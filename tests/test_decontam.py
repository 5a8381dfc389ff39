"""Eval-set decontamination invariants (operators/decontam.py) beyond the
oracle mirror in test_oracles.py: shingle edge cases, removal exactness,
and the broadcast-probe plan shape the 100-TB story depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from fhirflat_spark.operators.decontam import (
    EVAL_MOD,
    contamination,
    decontaminate,
    shingle_hashes,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, n_chars bigint"
    )


def test_short_docs_yield_no_shingles(spark):
    """Docs with < n words must produce ZERO shingles — Spark's
    sequence(0, -1) runs descending, so an unguarded transform would
    fabricate shingles for 1-word docs."""
    docs = _docs(spark, [
        (1, "solo", "en", 4),
        (2, "", "en", 0),
        (3, "two words", "en", 9),
    ])
    got = {
        r.doc_id: r.n
        for r in shingle_hashes(docs).groupBy("doc_id").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert 1 not in got and 2 not in got
    assert got[3] == 1  # exactly the one bigram


def test_shingles_are_distinct_per_doc(spark):
    docs = _docs(spark, [(1, "a b a b a b", "en", 11)])
    # bigrams: "a b" x3, "b a" x2 -> 2 distinct
    assert shingle_hashes(docs).count() == 2


def test_decontaminate_removes_exactly_flagged_and_eval(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    stats = contamination(docs)
    flagged = {r.doc_id for r in stats.where("contaminated").collect()}
    clean = decontaminate(docs)
    kept = {r.doc_id for r in clean.select("doc_id").collect()}
    all_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    eval_ids = {i for i in all_ids if i % EVAL_MOD == 0}
    assert flagged, "fixture must exercise the removal path"
    assert kept == all_ids - eval_ids - flagged
    # survivors keep full rows (the anti-join must not drop columns)
    assert clean.columns == docs.columns


def test_contamination_plan_broadcasts_eval_side(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    df = contamination(docs)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # map-side partial agg on the one shuffle
    assert plan.count("HashAggregate") >= 2
