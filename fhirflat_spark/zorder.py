"""Z-order (Morton-curve) multi-column clustering — pure Catalyst.

One-dimensional clustering (sort by `repo`, or by `doc_id`) gives zone
maps pruning power on ONE column; a selective filter on any other column
still touches every partition. Interleaving the bits of several columns'
normalized values puts rows that are close in EVERY dimension into the
same partitions, so the manifest's partition-level zones (and the
chunk-level zones under them) prune on each participating column at
roughly the |filter|^(1/n) rate — the Delta/Iceberg OPTIMIZE ZORDER
pattern, expressed here as a plain Catalyst projection:

    df2 = cluster_by_zorder(df, ["doc_id", "n_chars"], num_partitions=64)
    encode_table(df2, out, shuffle=False)   # layout-preserving encode

Design (scale-first):

- **The key is a single LONG built by codegen** — per column: equi-width
  normalize to ``bits`` levels (bounds from one metadata-sized agg, or
  caller-supplied), then OR the shifted bits into interleaved positions.
  No UDF, no shuffle beyond the one ``repartitionByRange`` every
  clustering rewrite needs anyway.
- **Equi-width levels, not equi-depth.** Delta computes range-partition
  ids (equi-depth) with an extra pass; equi-width needs only min/max and
  is monotone in each input — skewed value distributions degrade
  balance, not correctness (the range partitioner re-balances ROWS; only
  zone selectivity on the skewed column degrades). Callers with known
  heavy skew can pre-transform (e.g. log) the column.
- Strings participate via their first-8-byte lexicographic rank
  (``substring`` → big-endian int), monotone in the collation the zone
  maps compare with.

Cite: reference has no clustering op (single-process pandas); this is
the cluster-scale layout tool its `ingest.py` sort-by-filename
(reference fhirflat/ingest.py:431) stands in for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ZKEY = "__zkey"

# string columns cluster by dictionary rank up to this many distinct
# values (one distinct-agg pass, driver holds only the dictionary);
# beyond it, first-8-byte lexicographic rank
_DICT_CAP = 1024


def _level(col: Column, lo, hi, bits: int) -> Column:
    """Equi-width level in [0, 2^bits) — monotone, NULLs to level 0."""
    n_levels = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    scaled = (
        (col.cast("double") - F.lit(float(lo)))
        / F.lit(float(hi) - float(lo))
        * F.lit(float(n_levels))
    )
    lev = F.floor(scaled).cast("long")
    # explicit NULL branch: least/greatest IGNORE nulls, so clamping
    # alone would send NULL keys to the TOP level instead of 0
    return F.when(col.isNull(), F.lit(0).cast("long")).otherwise(
        F.greatest(F.lit(0), F.least(lev, F.lit(n_levels)))
    )


def zorder_key(df: DataFrame, cols: list[str], bits: int = 12,
               bounds: dict[str, tuple] | None = None) -> Column:
    """The interleaved Morton key as a Catalyst column. ``bounds`` maps
    column → (min, max); missing bounds are computed with ONE
    metadata-sized aggregate over ``df``."""
    need = [c for c in cols if not bounds or c not in bounds]
    bounds = dict(bounds or {})
    if need:
        aggs = []
        for c in need:
            aggs += [F.min(F.col(f"`{c}`")).alias(f"lo_{c}"),
                     F.max(F.col(f"`{c}`")).alias(f"hi_{c}")]
        row = df.agg(*aggs).collect()[0]
        for c in need:
            bounds[c] = (row[f"lo_{c}"], row[f"hi_{c}"])
    n = len(cols)
    levels = []
    for c in cols:
        lo, hi = bounds[c]
        dt = df.schema[c].dataType
        col = F.col(f"`{c}`")
        if isinstance(dt, T.StringType):
            if lo is not None and hi is not None and c not in need:
                # caller-supplied bounds are the documented way to skip
                # extra passes — honor them with the byte-rank path
                # instead of probing distinct values
                col = _str_to_long(col)
                lo, hi = _py_str_rank(lo), _py_str_rank(hi)
                levels.append(_level(col, lo, hi, bits))
                continue
            # equi-width over byte ranks wastes the level space when the
            # distinct values cluster lexicographically ('de','en','fr'
            # share a leading byte, squeezing into a sliver of levels so
            # the other dimension's bits dominate the curve) — use
            # dictionary (equi-depth) ranks while the cardinality is
            # dictionary-sized, byte-rank only beyond that
            vals = [
                r[0]
                for r in df.select(col.alias("v")).distinct()
                .limit(_DICT_CAP + 1).collect()
            ]
            if len(vals) <= _DICT_CAP:
                order = sorted(v for v in vals if v is not None)
                n_levels = (1 << bits) - 1
                step = max(n_levels // max(len(order) - 1, 1), 1)
                mapping = F.create_map(
                    *[
                        F.lit(x)
                        for v_i, v in enumerate(order)
                        for x in (v, min(v_i * step, n_levels))
                    ]
                )
                levels.append(
                    F.coalesce(mapping[col], F.lit(0)).cast("long")
                )
                continue
            # high-cardinality fallback: first-8-byte lexicographic rank
            col = _str_to_long(col)
            lo, hi = _py_str_rank(lo), _py_str_rank(hi)
        elif isinstance(dt, (T.TimestampType, T.DateType)):
            import datetime as _dt

            if isinstance(dt, T.TimestampType):
                col = col.cast("long")  # epoch seconds
                conv = lambda v: int(v.timestamp())  # noqa: E731
            else:
                # DATE cannot cast to BIGINT (ANSI) — unix_date is the
                # sanctioned epoch-days conversion
                col = F.unix_date(col)
                conv = lambda v: (v - _dt.date(1970, 1, 1)).days  # noqa: E731
            lo, hi = conv(lo), conv(hi)
        levels.append(_level(col, lo, hi, bits))
    # interleave: bit j of column c lands at position j*n + c
    z = F.lit(0).cast("long")
    for c_idx, lev in enumerate(levels):
        for j in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(lev, j).bitwiseAND(F.lit(1)), j * n + c_idx
                )
            )
    return z


def _str_to_long(col: Column) -> Column:
    """First-8-byte lexicographic rank of a string as a positive long
    (7 bits per byte — ASCII-exact, multi-byte UTF-8 still monotone on
    the leading byte)."""
    padded = F.rpad(F.coalesce(col, F.lit("")), 8, "\x00")
    z = F.lit(0).cast("long")
    for i in range(8):
        byte = F.ascii(F.substring(padded, i + 1, 1)).cast("long")
        byte = F.least(F.greatest(byte, F.lit(0)), F.lit(127))
        z = z.bitwiseOR(F.shiftleft(byte, 7 * (7 - i)))
    return z


def _py_str_rank(s) -> int:
    v = 0
    b = (s or "").encode("utf-8", "replace")[:8].ljust(8, b"\x00")
    for i, byte in enumerate(b):
        v |= min(byte, 127) << (7 * (7 - i))
    return v


def cluster_by_zorder(df: DataFrame, cols: list[str],
                      num_partitions: int, bits: int = 12,
                      bounds: dict[str, tuple] | None = None) -> DataFrame:
    """Cluster ``df`` along the Morton curve of ``cols``: range-partition
    + in-partition sort on the interleaved key, key dropped on the way
    out. Feed the result to ``encode_table(..., shuffle=False)`` — the
    layout-preserving encode keeps the curve order, so partition AND
    chunk zone maps become selective on every participating column."""
    z = zorder_key(df, cols, bits=bits, bounds=bounds)
    return (
        df.withColumn(ZKEY, z)
        .repartitionByRange(num_partitions, F.col(ZKEY))
        .sortWithinPartitions(ZKEY)
        .drop(ZKEY)
    )
