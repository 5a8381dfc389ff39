"""Temporal joins the built-in Spark operator set lacks: as-of join and
bounded range (interval) self-join — expressed as compositions of
existing DataFrame ops (one hash shuffle + in-partition sort / banded
equi-join), never a CartesianProduct and never per-row Python.

No reference analog (the reference is a single-process flattening
pipeline); these are the event-stream operators a training-data /
analytics deployment of the engine needs (the brief's "custom operators
Spark lacks": as-of join, range join).

Scale notes (100 TB):

- ``asof_join`` is the union-window formulation: tag both inputs, ONE
  hash exchange on the key, in-partition sort by (ts, side), then a
  running ``last(..., ignorenulls)`` carries the newest right-side
  payload forward into each left row. Cost = one shuffle of |L| + |R|
  rows — the same plan shape Spark gives a groupBy over the union, and
  the standard distributed as-of strategy (a per-left-row subquery or a
  range theta-join would be quadratic / unbucketed). Skewed keys salt
  the same way any groupBy does.
- ``range_join`` is the banded candidate join: bucket timestamps into
  window-sized bins, explode the left side into its bin and both
  neighbors (3x row inflation — bounded, chosen over a theta-join that
  Catalyst would execute as BroadcastNestedLoop/Cartesian), equi-join on
  (key, bin), then apply the exact |Δt| predicate. Every qualifying pair
  is produced exactly once: the right row's single bin is probed by
  exactly one of the left row's three probes. Per-(key, bin) cell size
  is bounded by event-rate x window — the candidate blowup is local,
  never all-pairs (same design rule as the LSH/SimHash pair generators,
  dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F

# module-level queries read the shared testdata tables
_EVENTS = "events.parquet"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_cols: list[str],
    prefix: str = "asof_",
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``ts`` <= the left row's ``ts`` (``strict=True``: <) sharing the
    ``on`` key — the ASOF LEFT JOIN of DuckDB/QuestDB/kdb, as one
    shuffle + window instead of a per-row lookup.

    Rows from ``right`` should be unique per (on, ts) — with duplicates
    the carried payload is the last in the in-partition sort order
    (pre-aggregate to make it deterministic). Unmatched left rows keep
    typed nulls (LEFT semantics). Output = every left column plus
    ``{prefix}{ts}`` and ``{prefix}{c}`` for each requested right
    column."""
    payload = F.struct(
        F.col(ts).alias(f"{prefix}{ts}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
    )
    # side ordering at EQUAL ts decides inclusivity: inclusive sorts the
    # right row first (visible to the left row's running last); strict
    # sorts it after
    r_tag, l_tag = (0, 1) if not strict else (1, 0)
    left_cols = left.columns
    tagged_r = right.select(
        F.col(on).alias("__k"),
        F.col(ts).alias("__t"),
        F.lit(r_tag).alias("__side"),
        payload.alias("__p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols],
    )
    tagged_l = left.select(
        F.col(on).alias("__k"),
        F.col(ts).alias("__t"),
        F.lit(l_tag).alias("__side"),
        F.lit(None).cast(tagged_r.schema["__p"].dataType).alias("__p"),
        *left_cols,
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = tagged_r.unionByName(tagged_l).withColumn(
        "__m", F.last("__p", ignorenulls=True).over(w)
    )
    return matched.where(F.col("__side") == l_tag).select(
        *left_cols, "__m.*"
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    window_sec: int,
    left_prefix: str = "a_",
    right_prefix: str = "b_",
) -> DataFrame:
    """All (left, right) pairs sharing the ``on`` key whose timestamps
    lie within ``window_sec`` of each other — the bounded interval join,
    as a banded equi-join (bin + neighbor probes), never a nested-loop.
    Output columns: every left column under ``left_prefix``, every right
    column under ``right_prefix``."""
    wus = int(window_sec) * 1_000_000
    # NTZ-safe: session tz is pinned UTC (session.py), so the cast is a
    # pure reinterpretation on both sides of the join
    micros = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    bin_of = lambda c: (micros(c) / wus).cast("long")  # noqa: E731
    lp = left.select(
        F.col(on).alias("__k"),
        bin_of(ts).alias("__b0"),
        *[F.col(c).alias(f"{left_prefix}{c}") for c in left.columns],
    ).withColumn(
        "__probe", F.explode(F.array(F.col("__b0") - 1, F.col("__b0"),
                                     F.col("__b0") + 1))
    )
    rp = right.select(
        F.col(on).alias("__k"),
        bin_of(ts).alias("__probe"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns],
    )
    joined = lp.join(rp, on=["__k", "__probe"], how="inner")
    dt = (
        F.unix_micros(F.col(f"{right_prefix}{ts}").cast("timestamp"))
        - F.unix_micros(F.col(f"{left_prefix}{ts}").cast("timestamp"))
    )
    return joined.where(F.abs(dt) <= wus).drop("__k", "__probe", "__b0")


# ---------------------------------------------------------------- queries


def q_asof_attribution(spark, sf_dir):
    """Purchase-to-click attribution: each purchase event joined as-of
    to the user's latest click at-or-before the purchase (inclusive
    backward as-of). Clicks are pre-aggregated per (user, ts) so ties
    are deterministic on both engines. Unmatched purchases (no prior
    click) keep nulls — an off-by-one in the inclusivity ordering, a
    missing-key leak, or a forward-looking match shifts rows and fails
    the hash."""
    # the NTZ→timestamp reinterpretation inside asof_join/range_join is
    # only a no-op under a UTC session; pin it here too so the DRIVER's
    # session (not created by session.py) can never skew the comparison
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_dir}/{_EVENTS}")
    clicks = (
        ev.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("click_value"))
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(
        purchases, clicks, on="user_id", ts="ts",
        right_cols=["click_value"], prefix="asof_",
    )
    return out.select(
        "event_id", "user_id", "value",
        F.col("asof_ts").alias("click_ts"),
        F.col("asof_click_value").alias("click_value"),
    ).orderBy("event_id")


SQL_ASOF_ATTRIBUTION = """
WITH clicks AS (
  SELECT user_id, ts, max(value) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
), purchases AS (
  SELECT event_id, user_id, ts, value
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.value,
       c.ts AS click_ts, c.click_value
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY p.event_id
"""


def q_range_pairs(spark, sf_dir):
    """Co-occurrence pairs: events of the same user within 30 minutes of
    each other (event_id ordered to emit each unordered pair once),
    via the banded equi-join — the oracle brute-forces the same
    predicate, so a band that drops an edge-of-window pair or
    double-emits a probe fails the row count and hash."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # see q_asof above
    ev = spark.read.parquet(f"{sf_dir}/{_EVENTS}").select(
        "event_id", "user_id", "ts", "event_type"
    )
    pairs = range_join(ev, ev, on="user_id", ts="ts", window_sec=1800)
    return (
        pairs.where(F.col("a_event_id") < F.col("b_event_id"))
        .select(
            F.col("a_event_id").alias("id_a"),
            F.col("b_event_id").alias("id_b"),
            F.col("a_user_id").alias("user_id"),
            F.col("a_event_type").alias("type_a"),
            F.col("b_event_type").alias("type_b"),
            (
                F.unix_micros(F.col("b_ts").cast("timestamp"))
                - F.unix_micros(F.col("a_ts").cast("timestamp"))
            ).alias("micros_apart"),
        )
        .orderBy("id_a", "id_b")
    )


SQL_RANGE_PAIRS = """
SELECT a.event_id AS id_a, b.event_id AS id_b, a.user_id,
       a.event_type AS type_a, b.event_type AS type_b,
       date_diff('microsecond', a.ts, b.ts) AS micros_apart
FROM events a JOIN events b
  ON a.user_id = b.user_id AND a.event_id < b.event_id
 AND abs(date_diff('microsecond', a.ts, b.ts)) <= 1800 * 1000000
ORDER BY id_a, id_b
"""


QUERIES = {
    "asof_join_attribution": (q_asof_attribution, SQL_ASOF_ATTRIBUTION),
    "range_join_pairs": (q_range_pairs, SQL_RANGE_PAIRS),
}
