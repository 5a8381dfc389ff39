"""Mapping-driven ingest: the reference's flagship pipeline (SURVEY §3.1),
re-expressed as one Catalyst plan.

Reference shape (fhirflat ``convert_data_to_flat``, ingest.py:435-601):
raw wide CSV + a mapping rule table ``(raw_variable, raw_response) ->
{target_field: expr}`` where expr is a mini-DSL: ``<FIELD>`` (the raw
cell), ``<other_col>`` (another column of the row), ``A + B`` (concat),
``<A> if not <B>`` (inverse coalesce), or a literal. The reference
evaluates this per row in Python against a pandas multi-index
(ingest.py:49-95, 148-175, 357-366).

Spark-first translation — zero per-row Python:
1. **melt** the wide frame to long ``(row_id, variable, response)``
   via ``stack`` (R4, reference ingest.py:350-353), carrying id columns;
2. **broadcast-join** the long frame against the mapping table on
   ``(variable, response)`` with a response-wildcard fallback row
   (J1, the pandas multi-index lookup made a hash join);
3. **compile the DSL once at plan time** into Column expressions
   (F9/F10) — field refs become columns, concat becomes ``concat_ws``,
   ``if not`` becomes ``when(isNull)``;
4. **pivot/re-group** assignments back to one row per entity
   (A1/A2 condense semantics).

Missing mappings surface as a count/side-channel, not a crash
(reference warns at ingest.py:155-160).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FIELD_TOKEN = "<FIELD>"


def compile_rule_expr(expr: str, response_col: Column, raw_cols: list[str]) -> Column:
    """Compile one mapping-cell DSL string to a Catalyst Column.

    Grammar (from reference ingest.py:49-95):
      ``<FIELD>``            -> the raw response value
      ``<col>``              -> another raw column of the same row
      ``X + Y``              -> concat with space (no space around '/')
      ``<A> if not <B>``     -> A when B is null, else null
      anything else          -> literal
    """
    expr = expr.strip()
    m = re.match(r"^(.*)\s+if\s+not\s+(.*)$", expr)
    if m:
        value = compile_rule_expr(m.group(1), response_col, raw_cols)
        guard = compile_rule_expr(m.group(2), response_col, raw_cols)
        return F.when(guard.isNull(), value)
    if " + " in expr:
        parts = [compile_rule_expr(p, response_col, raw_cols) for p in expr.split(" + ")]
        joiner = "" if "/" in expr else " "
        return F.concat_ws(joiner, *[p.cast("string") for p in parts])
    if expr == FIELD_TOKEN:
        return response_col.cast("string")
    m = re.match(r"^<([^<>]+)>$", expr)
    if m:
        name = m.group(1)
        if name in raw_cols:
            return F.col(f"__raw_{name}").cast("string")
        return F.lit(None).cast("string")
    return F.lit(expr)


def melt(df: DataFrame, id_cols: list[str], value_cols: list[str],
         var_name: str = "variable", value_name: str = "response") -> DataFrame:
    """Wide -> long unpivot carrying id columns (R4; avoids the reference's
    per-row cross-row fetch J2 by keeping ids on every long row)."""
    pairs = ", ".join(f"'{c}', cast(`{c}` as string)" for c in value_cols)
    return df.select(
        *id_cols,
        F.expr(f"stack({len(value_cols)}, {pairs}) as ({var_name}, {value_name})"),
    )


def apply_mapping(
    raw: DataFrame,
    mapping: DataFrame,
    id_cols: list[str],
    carry_cols: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """raw wide frame + mapping(variable, response, target, expr) ->
    (assignments long frame, unmapped side-channel).

    ``mapping.response`` may be NULL = wildcard (rule applies to any
    non-null response — the reference's free-text rows). Returns one row
    per (id, target) with the compiled value, plus the rows whose
    (variable, response) had no rule (the missing-mapping warning path).
    """
    carry_cols = carry_cols or []
    # P1 relevance pruning (reference ingest.py:310-311): only raw columns
    # that appear in the mapping take the melt->join path; everything else
    # never leaves the scan (Catalyst prunes it there)
    mapped_vars = {r["variable"] for r in mapping.select("variable").distinct().collect()}
    value_cols = [c for c in raw.columns if c not in id_cols and c in mapped_vars]
    raw2 = raw
    for c in carry_cols:
        raw2 = raw2.withColumn(f"__raw_{c}", F.col(c))
    long = melt(raw2, id_cols + [f"__raw_{c}" for c in carry_cols], value_cols)
    long = long.where(F.col("response").isNotNull())  # P4 null filter

    exact = mapping.where(F.col("response").isNotNull()).select(
        "variable", "response", "target", F.col("expr").alias("rule"),
    )
    wild = mapping.where(F.col("response").isNull()).select(
        "variable", F.col("target").alias("w_target"), F.col("expr").alias("w_rule"),
    )

    joined = (
        long.join(F.broadcast(exact), ["variable", "response"], "left")
        .join(F.broadcast(wild), ["variable"], "left")
        .withColumn("target", F.coalesce("target", "w_target"))
        .withColumn("rule", F.coalesce("rule", "w_rule"))
    )
    unmapped = joined.where(F.col("target").isNull()).select(
        *id_cols, "variable", "response"
    )
    mapped = joined.where(F.col("target").isNotNull())

    # compile every distinct rule once (plan-time), dispatch with a chained
    # when() — the expression tree stays fully JVM-side
    rules = [r["rule"] for r in mapped.select("rule").distinct().collect()]
    value = F.lit(None).cast("string")
    for rule in rules:
        compiled = compile_rule_expr(rule, F.col("response"), carry_cols)
        value = F.when(F.col("rule") == rule, compiled).otherwise(value)
    assignments = mapped.select(*id_cols, "target", value.alias("value"))
    return assignments, unmapped


def condense_one_to_one(assignments: DataFrame, id_cols: list[str]) -> DataFrame:
    """(id, target, value) -> one row per id, one column per target.

    A2 semantics (reference ingest.py:319-348): a (id, target) group with
    >1 distinct value is a mapping conflict — surfaced in a ``__conflicts``
    column instead of raising, so one bad row can't kill a 10^12-row job.
    """
    per_target = assignments.groupBy(*id_cols, "target").agg(
        F.count_distinct("value").alias("n"),
        F.min("value").alias("value"),
    )
    wide = (
        per_target.groupBy(*id_cols)
        .pivot("target")
        .agg(F.first("value"))
    )
    conflicts = (
        per_target.where(F.col("n") > 1)
        .groupBy(*id_cols)
        .agg(F.collect_set("target").alias("__conflicts"))
    )
    return wide.join(conflicts, id_cols, "left")


# --- F6: full date-parsing semantics (reference format_dates,
#     ingest.py:98-131): user strptime format + IANA timezone ->
#     ISO8601 string, with (a) date-only detection when the format has
#     no %H, (b) a "date time" split fallback when the primary parse
#     leaves unconverted data, and (c) a warn side-channel for strings
#     that parse neither way (the reference warns and passes the raw
#     string through to FHIR validation). All JVM expressions — the
#     reference's per-row strptime/dateutil loop becomes one projection.

_STRPTIME_TO_JVM = [
    ("%Y", "yyyy"), ("%y", "yy"), ("%m", "MM"), ("%d", "dd"),
    ("%H", "HH"), ("%M", "mm"), ("%S", "ss"), ("%b", "MMM"), ("%B", "MMMM"),
]

# the reference parses the time part with dateutil (fully flexible);
# approximated here by the candidate formats that cover its common cases
_TIME_FORMATS = ("HH:mm:ss", "HH:mm")


def _jvm_datetime_format(strptime_fmt: str) -> str:
    out = strptime_fmt
    for k, v in _STRPTIME_TO_JVM:
        out = out.replace(k, v)
    return out


def _iso_with_offset(ts: Column, timezone: str) -> Column:
    """ISO8601 render with the timezone's UTC offset at that instant
    (DST-correct): datetime.replace(tzinfo=tz).isoformat() semantics."""
    utc = F.to_utc_timestamp(ts, timezone)
    off = F.unix_timestamp(ts) - F.unix_timestamp(utc)
    sign = F.when(off < 0, F.lit("-")).otherwise(F.lit("+"))
    ao = F.abs(off)
    hh = F.lpad((ao / 3600).cast("int").cast("string"), 2, "0")
    mm = F.lpad(F.pmod((ao / 60).cast("int"), F.lit(60)).cast("string"), 2, "0")
    return F.concat(
        F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"), sign, hh, F.lit(":"), mm
    )


def parse_dates_expr(col: Column, date_format: str,
                     timezone: str) -> tuple[Column, Column]:
    """Compile F6 into two Columns: ``(value, warn)``.

    ``value``: the ISO8601 string (date-only when ``date_format`` lacks
    ``%H``; with UTC offset otherwise / via the split fallback), or the
    ORIGINAL string when unparseable (reference passes it through for
    FHIR to flag). ``warn``: boolean flag marking those pass-throughs —
    the distributed version of the reference's ``warnings.warn``.
    """
    jfmt = _jvm_datetime_format(date_format)
    date_only = "%H" not in date_format
    p1 = F.try_to_timestamp(col, F.lit(jfmt))
    # fallback: exactly one "date time" space split (reference
    # str.split(" ") unpacks into 2 parts or raises -> warn)
    parts_ok = F.size(F.split(col, " ")) == 2
    d2 = F.try_to_timestamp(F.substring_index(col, " ", 1), F.lit(jfmt))
    t2 = F.coalesce(
        *[F.try_to_timestamp(F.substring_index(col, " ", -1), F.lit(tf))
          for tf in _TIME_FORMATS]
    )
    ts2 = F.when(
        parts_ok & d2.isNotNull() & t2.isNotNull(),
        F.timestamp_seconds(F.unix_timestamp(d2) + F.unix_timestamp(t2)),
    )
    primary = (
        F.date_format(p1, "yyyy-MM-dd") if date_only
        else _iso_with_offset(p1, timezone)
    )
    value = F.when(p1.isNotNull(), primary).otherwise(
        F.when(ts2.isNotNull(), _iso_with_offset(ts2, timezone)).otherwise(col)
    )
    warn = col.isNotNull() & p1.isNull() & ts2.isNull()
    return value, warn
