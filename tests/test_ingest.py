"""Mapping-DSL ingest tests — modeled on the reference's end-to-end ingest
suite (reference tests/test_ingest.py:263-911): rule application, concat /
if-not DSL, wildcard rows, missing-mapping side-channel, one-to-one
condense conflict flagging.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fhirflat_spark.ingest import apply_mapping, condense_one_to_one, melt


@pytest.fixture(scope="module")
def raw(spark):
    return spark.createDataFrame(
        [
            ("s1", "v1", "1", "2021-04-01", "alpha"),
            ("s2", "v1", "2", "2021-04-02", None),
            ("s3", "v2", "3", None, "gamma"),
            ("s4", "v2", "9", "2021-04-04", "delta"),  # 9 has no mapping rule
        ],
        ["subjid", "visitid", "outcome", "visit_date", "freetext"],
    )


@pytest.fixture(scope="module")
def mapping(spark):
    # (variable, response, target, expr); response NULL = wildcard
    return spark.createDataFrame(
        [
            ("outcome", "1", "status", "recovered"),
            ("outcome", "2", "status", "died"),
            ("outcome", "3", "status", "unknown"),
            ("visit_date", None, "period.start", "<FIELD>"),
            ("freetext", None, "note", "<subjid> + <FIELD>"),
        ],
        ["variable", "response", "target", "expr"],
    )


def test_melt_shape(spark, raw):
    long = melt(raw, ["subjid"], ["outcome", "visit_date"])
    assert long.columns == ["subjid", "variable", "response"]
    assert long.count() == 8  # includes null responses until filtered


def test_apply_mapping_rules(spark, raw, mapping):
    assigns, unmapped = apply_mapping(raw, mapping, ["subjid"], carry_cols=["subjid"])
    got = {(r["subjid"], r["target"]): r["value"] for r in assigns.collect()}
    assert got[("s1", "status")] == "recovered"
    assert got[("s2", "status")] == "died"
    assert got[("s3", "status")] == "unknown"
    assert got[("s1", "period.start")] == "2021-04-01"
    assert ("s3", "period.start") not in got  # null response dropped (P4)
    assert got[("s1", "note")] == "s1 alpha"  # concat DSL with carry col
    # missing-mapping side-channel: outcome=9 has no rule
    miss = unmapped.collect()
    assert len(miss) == 1 and miss[0]["subjid"] == "s4" and miss[0]["response"] == "9"


def test_if_not_rule(spark):
    raw = spark.createDataFrame(
        [("a", "x", "has_props"), ("b", "y", None)],
        ["id", "val", "props"],
    )
    mapping = spark.createDataFrame(
        [("val", None, "out", "<FIELD> if not <props>")],
        "variable string, response string, target string, expr string",
    )
    assigns, _ = apply_mapping(raw, mapping, ["id"], carry_cols=["props"])
    got = {r["id"]: r["value"] for r in assigns.where(F.col("target") == "out").collect()}
    assert got["b"] == "y"       # props null -> value flows
    assert got.get("a") is None  # props present -> suppressed


def test_condense_conflict_flag(spark):
    assigns = spark.createDataFrame(
        [("s1", "status", "recovered"), ("s1", "status", "died"),
         ("s2", "status", "died"), ("s2", "date", "2021-01-01")],
        ["subjid", "target", "value"],
    )
    wide = condense_one_to_one(assigns, ["subjid"])
    rows = {r["subjid"]: r for r in wide.collect()}
    # conflict surfaced as a flag column, not an exception (A2)
    assert rows["s1"]["__conflicts"] == ["status"]
    assert rows["s2"]["__conflicts"] is None
    assert rows["s2"]["status"] == "died"
    assert rows["s2"]["date"] == "2021-01-01"
