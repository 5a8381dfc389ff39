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


def _reference_format_dates(date_str, date_format, timezone):
    """Faithful reimplementation of the reference's format_dates
    (reference fhirflat/ingest.py:98-131) as the parity oracle: strptime
    primary parse, date-only when the format lacks %H, 'date time' split
    fallback (time parsed HH:MM[:SS]), raw pass-through on failure."""
    import datetime as dt
    from zoneinfo import ZoneInfo

    if date_str is None:
        return None, False
    tz = ZoneInfo(timezone)
    try:
        parsed = dt.datetime.strptime(date_str, date_format)
        aware = parsed.replace(tzinfo=tz)
        if "%H" not in date_format:
            return aware.date().isoformat(), False
        return aware.isoformat(), False
    except ValueError:
        try:
            date_part, time_part = date_str.split(" ")
            d = dt.datetime.strptime(date_part, date_format)
            try:
                t = dt.datetime.strptime(time_part, "%H:%M:%S").time()
            except ValueError:
                t = dt.datetime.strptime(time_part, "%H:%M").time()
            combined = dt.datetime.combine(d.date(), t).replace(tzinfo=tz)
            return combined.isoformat(), False
        except ValueError:
            return date_str, True


def test_parse_dates_matches_reference_semantics(spark):
    """parse_dates_expr must reproduce the reference format_dates
    behavior case-for-case: date-only, datetime format, split fallback,
    DST winter/summer offsets, unparseable warn pass-through, NULL."""
    from fhirflat_spark.ingest import parse_dates_expr

    cases = [
        # (raw, fmt) — spanning every reference branch
        ("15/06/2021", "%d/%m/%Y"),            # date-only
        ("15/01/2021", "%d/%m/%Y"),            # winter (offset +01:00)
        ("15/06/2021 14:30:00", "%d/%m/%Y"),   # split fallback, summer
        ("15/01/2021 09:05", "%d/%m/%Y"),      # split fallback, HH:MM
        ("2021-06-15 23:59:59", "%Y-%m-%d"),   # ISO-ish date + time
        ("garbage", "%d/%m/%Y"),               # warn pass-through
        ("15/06/2021 nonsense", "%d/%m/%Y"),   # bad time part -> warn
        ("1/2/3/4", "%d/%m/%Y"),               # malformed -> warn
        (None, "%d/%m/%Y"),                    # NULL stays NULL, no warn
        ("31/12/1999 23:00:00", "%d/%m/%Y"),   # year boundary
        # formats WITH %H: primary parse emits the tz-offset ISO form
        ("15/06/2021 14:30:00", "%d/%m/%Y %H:%M:%S"),
        ("15/01/2021 14:30:00", "%d/%m/%Y %H:%M:%S"),  # winter offset
        ("15/06/2021", "%d/%m/%Y %H:%M:%S"),   # missing time -> warn
        ("15/06/2021 14:30:00 extra", "%d/%m/%Y"),  # 3 parts -> warn
    ]
    tz = "Europe/Paris"
    for fmt in {f for _, f in cases}:
        rows = [(i, raw) for i, (raw, f) in enumerate(cases) if f == fmt]
        df = spark.createDataFrame(rows, "id LONG, raw STRING")
        value, warn = parse_dates_expr(F.col("raw"), fmt, tz)
        got = {
            r["id"]: (r["parsed"], bool(r["warn"]))
            for r in df.select(
                "id", value.alias("parsed"), warn.alias("warn")
            ).collect()
        }
        for i, raw in rows:
            want = _reference_format_dates(raw, fmt, tz)
            assert got[i] == want, (
                f"raw={raw!r} fmt={fmt!r}: engine={got[i]} reference={want}"
            )
