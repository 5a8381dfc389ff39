"""Encoded-domain aggregation: GROUP BY directly on compressed chunks.

The classic payoff of lightweight compression (C-Store / Abadi,
"Integrating Compression and Execution in Column-Oriented Database
Systems", SIGMOD'06) is that some operators can run on the encoded
representation without ever materializing row values:

- **dict** chunks: ``np.bincount`` over the bit-packed code stream +
  the (tiny) dictionary — per-chunk work is O(rows) on small ints and
  O(distinct) on the actual values; the strings themselves are touched
  once per distinct value, not once per row.
- **rle** chunks: the run-length stream *is* a pre-aggregated
  (value, count) list — group-count needs no row materialization at
  all, just a sum of run lengths per run value.
- **constant** chunks: one (value, n_rows) pair straight from the
  chunk header.
- anything else (zstd/fsst/prefix strings, numeric streams) falls back
  to a normal chunk decode followed by Arrow's C++ hash group-by — the
  partial-aggregation shape is identical, only the per-chunk constant
  factor differs.

Both entry points emit **per-task partial aggregates** (one row per
distinct group value per task — metadata-sized), so the only shuffle
moves partials, never rows: on a 1000-executor scan of a 100-TB table
the exchange carries |tasks| x |distinct| rows. The final merge is a
plain Catalyst ``groupBy`` over that tiny frame.

Correctness contract: results equal ``SELECT g, COUNT(*) ... GROUP BY
g`` / ``SUM/MIN/MAX(v)`` with SQL NULL semantics (NULL is a group;
SUM/MIN/MAX skip NULL values and return NULL for all-NULL groups).
Mirrors the reference's summary statistics over flat bundles
(reference fhirflat/ingest.py:381-432 records per-resource row counts
in ``fhirflat.toml``) — here the counts come from the codec streams.

Active row-level deletes are REFUSED (like
``manifest.aggregate_from_metadata``): encoded chunks are physical,
deletes are logical overlays — compact first, or use
``decode_table(...).groupBy`` which applies the overlay.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fhirflat_spark.codecs import decode_array
from fhirflat_spark.codecs.core import from_physical, unpack_bits
from fhirflat_spark.codecs.kernels import _dec_sub, ipc_array


def _keys_counts(blob) -> tuple[pa.Array, np.ndarray, int]:
    """One chunk blob -> (distinct values, counts, null_count).

    Stays in the encoded domain for dict/rle/constant; decodes + Arrow
    ``value_counts`` otherwise. The returned ``values`` array is the
    chunk's LOGICAL type and never longer than the chunk's distinct
    count."""
    from fhirflat_spark.codecs.core import unpack_chunk

    codec, n, token, meta, secs = unpack_chunk(blob)
    if n == 0:
        return None, None, 0
    if codec == "nullable":
        vals, cnts, _ = _keys_counts(secs[1])
        return vals, cnts, n - meta["valid"]
    if codec == "constant":
        one = from_physical(ipc_array(bytes(secs[0])), token)
        return one.slice(0, 1), np.array([n], dtype=np.int64), 0
    if codec == "dict":
        codes = unpack_bits(secs[0], meta["width"], n).view(np.int64)
        cnts = np.bincount(codes, minlength=meta["size"]).astype(np.int64)
        vals = from_physical(_dec_sub(secs[1]), token)
        return vals, cnts, 0
    if codec == "rle":
        lens = _dec_sub(secs[0]).to_numpy(zero_copy_only=False)
        vals = from_physical(_dec_sub(secs[1]), token)
        return vals, lens.astype(np.int64, copy=False), 0
    arr = decode_array(blob)
    nulls = arr.null_count
    if nulls:
        arr = arr.drop_null()
    import pyarrow.compute as pc

    vc = pc.value_counts(arr)
    return (
        vc.field("values"),
        vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64),
        nulls,
    )


def _codes_keys(blob) -> tuple[np.ndarray, pa.Array]:
    """One chunk blob -> (full-length group codes, code->value array).

    ``codes[i] == -1`` marks a NULL group row; otherwise
    ``keys[codes[i]]`` is row i's group value. Used where a second
    column must be aggregated in row alignment with the groups — the
    group VALUES still materialize only once per distinct (or per run),
    never once per row."""
    from fhirflat_spark.codecs.core import unpack_chunk

    codec, n, token, meta, secs = unpack_chunk(blob)
    if codec == "nullable":
        valid = np.unpackbits(
            np.frombuffer(secs[0], dtype=np.uint8), count=n
        ).astype(bool)
        inner_codes, keys = _codes_keys(secs[1])
        codes = np.full(n, -1, dtype=np.int64)
        codes[valid] = inner_codes
        return codes, keys
    if codec == "constant":
        one = from_physical(ipc_array(bytes(secs[0])), token)
        return np.zeros(n, dtype=np.int64), one.slice(0, 1)
    if codec == "dict":
        codes = unpack_bits(secs[0], meta["width"], n).view(np.int64)
        return codes, from_physical(_dec_sub(secs[1]), token)
    if codec == "rle":
        lens = _dec_sub(secs[0]).to_numpy(zero_copy_only=False)
        vals = from_physical(_dec_sub(secs[1]), token)
        codes = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        return codes, vals
    arr = decode_array(blob)
    de = arr.dictionary_encode()
    idx = de.indices
    if idx.null_count:
        codes = idx.fill_null(-1).to_numpy(zero_copy_only=False)
    else:
        codes = idx.to_numpy(zero_copy_only=False)
    return codes.astype(np.int64, copy=False), de.dictionary


_WHERE_OPS = ("eq", "lt", "le", "gt", "ge", "in", "sw", "nu", "nn")


def _normalize_where(where) -> list[list[tuple]]:
    """Normalize a where spec to CNF: a list of clauses, each clause a
    list of ``(col, op, literal)`` predicates OR'd together; clauses
    AND together. Accepted inputs: ``None``; one predicate tuple; a
    list mixing predicate tuples (unit clauses) and lists/tuples OF
    predicate tuples (disjunctive clauses). A bare predicate is
    recognized by its first element being the column name (a str)."""
    if where is None:
        return []

    def _pred(p):
        p = tuple(p)
        if len(p) == 2:  # (col, "nu"/"nn") null tests carry no literal
            p = (p[0], p[1], None)
        if len(p) != 3:
            raise ValueError(f"where predicate {p!r}: expected (col, op, "
                             "literal)")
        col, op, v = p
        if op not in _WHERE_OPS:
            raise ValueError(f"where op {op!r}: expected one of {_WHERE_OPS}")
        return (col, op, v)

    def _is_pred(it):
        return (isinstance(it, (tuple, list)) and len(it) > 0
                and isinstance(it[0], str))

    items = [where] if _is_pred(where) else list(where)
    cnf = []
    for it in items:
        if _is_pred(it):
            cnf.append([_pred(it)])
        else:
            clause = [_pred(p) for p in it]
            if not clause:
                raise ValueError("empty OR clause in where")
            cnf.append(clause)
    return cnf


def _flat_preds(cnf: list[list[tuple]]) -> list[tuple]:
    return [p for clause in cnf for p in clause]


def _validate_where(cnf: list[list[tuple]], by_name: dict, spark) -> None:
    """Driver-side exactness gate: unlike the named source's pushed
    filters (where Spark re-applies the full predicate as a residual),
    an encoded-domain aggregate IS the final answer — so predicates are
    restricted to types whose Arrow comparison equals Spark/SQL
    semantics (binary-collated strings, integers, booleans; floats
    excluded: Spark orders NaN above everything), and a literal that
    does not coerce RAISES instead of silently keeping rows."""
    from fhirflat_spark.sources.datasource import (
        _row_filterable,
        _temporal_literal_ok,
    )

    for col, op, v in _flat_preds(cnf):
        if col not in by_name:
            raise ValueError(f"where column {col!r} not in dataset")
        if op in ("nu", "nn"):
            continue
        at = _arrow_field(spark, by_name[col])
        if not _row_filterable(at) or (
            op == "sw" and not pa.types.is_string(at)
        ):
            raise ValueError(
                f"where on {col!r} ({at}): only string/integer/boolean/"
                "date/ntz-timestamp columns support exact encoded-domain "
                "predicates"
            )
        vals = list(v) if op == "in" else [v]
        if op == "sw":
            if not isinstance(v, str):
                raise ValueError("sw (starts-with) needs a string literal")
            continue
        if pa.types.is_temporal(at):
            # pa.scalar coercion is too permissive for temporal types
            # (silently truncates datetime→date, accepts tz-aware) —
            # the strict family gate is the refusal here. IN builds an
            # arrow value-set of the column type, which (unlike the
            # binary comparisons) cannot promote date→timestamp, so a
            # timestamp IN-list must hold datetimes proper.
            import datetime as _dt

            for x in vals:
                if op == "in" and pa.types.is_timestamp(at) and \
                        not isinstance(x, _dt.datetime):
                    raise ValueError(
                        f"where literal {x!r}: a timestamp IN-list "
                        "needs naive datetime literals"
                    )
                if not _temporal_literal_ok(at, x):
                    raise ValueError(
                        f"where literal {x!r} does not match {col!r}'s "
                        f"temporal family ({at}): dates take date "
                        "literals, NTZ timestamps take naive datetimes "
                        "or dates — no residual exists to correct a "
                        "coerced comparison"
                    )
            continue
        for x in vals:
            try:
                pa.scalar(x, type=at)
            except (pa.ArrowInvalid, pa.ArrowTypeError, TypeError,
                    OverflowError) as e:
                raise ValueError(
                    f"where literal {x!r} does not coerce to {col!r} "
                    f"({at}) — no residual exists to correct it"
                ) from e


def _zone_of(pred: tuple) -> list[tuple]:
    """[(col, lo, hi)] range one predicate bounds, or [] when it bounds
    none (null tests, empty IN, uncomparable literals)."""
    col, op, v = pred
    if op == "eq":
        return [(col, v, v)]
    if op in ("lt", "le"):
        return [(col, None, v)]
    if op in ("gt", "ge"):
        return [(col, v, None)]
    if op == "in" and v is not None and len(v):
        try:
            return [(col, min(v), max(v))]
        except TypeError:
            return []
    if op == "sw":
        from fhirflat_spark.sources.datasource import _prefix_upper

        return [(col, v, _prefix_upper(v))]
    return []


def _where_zones(cnf: list[list[tuple]]) -> list[tuple]:
    """Conservative (col, lo, hi) zone triples for partition/chunk
    pruning. A disjunctive clause bounds a range only when EVERY branch
    bounds a range on the SAME column — the union range [min lo, max hi]
    then over-approximates the clause (a nu/nn branch admits rows a
    zone check would wrongly prune, so it voids the clause's zone)."""
    zones = []
    for clause in cnf:
        per = [_zone_of(p) for p in clause]
        if any(len(z) != 1 for z in per):
            continue
        triples = [z[0] for z in per]
        if len({t[0] for t in triples}) != 1:
            continue
        los = [t[1] for t in triples]
        his = [t[2] for t in triples]
        try:
            lo = None if any(x is None for x in los) else min(los)
            hi = None if any(x is None for x in his) else max(his)
        except TypeError:
            continue
        zones.append((triples[0][0], lo, hi))
    return zones


def _pred_entails_chunk(pred: tuple, chunk: dict, dtype=None) -> bool:
    """True only when the predicate provably holds for EVERY row of the
    chunk from metadata alone (zone bounds + null counts). Used by the
    top-k threshold walk: a fully-entailed chunk's non-null rows all
    satisfy the WHERE, so they may count toward the k-row guarantee.
    String zone bounds are truncated prefix (lo <= true min) / successor
    (hi >= true max) — every test below uses the bound on its safe side,
    so truncation can only LOSE entailment, never fake it. A type
    mismatch between the zone value and the literal declines (the Spark
    residual still applies the predicate exactly)."""
    col, op, v = pred
    n = chunk["n_rows"]
    # evolved-schema chunks omit the column from the nulls rollup:
    # every cell is NULL there
    nulls = chunk["nulls"].get(col, n)
    if op == "nu":
        return nulls == n
    if nulls != 0:
        return False  # a NULL row fails every value predicate
    if op == "nn":
        return True
    if dtype is not None:
        # type-directed literal conversion: temporal predicates compare
        # in the epoch-INT space the zones record (DateType days,
        # TimestampNTZType micros); a literal that does not convert —
        # incl. every session-tz TimestampType literal and a datetime
        # against a DATE column's day-zones — DECLINES rather than
        # comparing mismatched units
        if isinstance(dtype, (T.DateType, T.TimestampNTZType,
                              T.TimestampType)):
            from fhirflat_spark.manifest import coerce_zone_bound

            if op == "sw":
                return False
            if op == "in":
                vals = [coerce_zone_bound(dtype, x) for x in (v or [])]
                if not vals or any(x is None for x in vals):
                    return False
                v = vals
            else:
                v = coerce_zone_bound(dtype, v)
                if v is None:
                    return False
    zone = (chunk.get("zones") or {}).get(col)
    if zone is None:
        return False
    lo, hi = zone

    def _cmpable(a, b):
        if isinstance(a, str) and isinstance(b, str):
            return True
        return (isinstance(a, int) and not isinstance(a, bool)
                and isinstance(b, int) and not isinstance(b, bool))

    if op == "sw":
        from fhirflat_spark.sources.datasource import _prefix_upper

        if not (isinstance(v, str) and isinstance(lo, str)
                and isinstance(hi, str)):
            return False
        up = _prefix_upper(v)
        return lo >= v and up is not None and hi < up
    if op == "in":
        vals = list(v) if v is not None else []
        return (_cmpable(lo, hi) and lo == hi
                and any(_cmpable(lo, x) and lo == x for x in vals))
    if not _cmpable(lo, v) or not _cmpable(hi, v):
        return False
    if op == "eq":
        return lo == v and hi == v
    if op == "lt":
        return hi < v
    if op == "le":
        return hi <= v
    if op == "gt":
        return lo > v
    if op == "ge":
        return lo >= v
    return False


def _clause_entails_chunk(clause: list[tuple], chunk: dict,
                          type_of: dict | None = None) -> bool:
    """A disjunctive clause provably holds for every row when ANY one
    branch does (conservative: rows may also mix branches, which this
    check misses — it affects pruning, never answers)."""
    return any(
        _pred_entails_chunk(
            p, chunk, None if type_of is None else type_of.get(p[0])
        )
        for p in clause
    )


def _pred_expr(pred: tuple):
    col, op, v = pred
    c = F.col(col)
    if op == "eq":
        return c == F.lit(v)
    if op == "lt":
        return c < F.lit(v)
    if op == "le":
        return c <= F.lit(v)
    if op == "gt":
        return c > F.lit(v)
    if op == "ge":
        return c >= F.lit(v)
    if op == "in":
        return c.isin(list(v) if v is not None else [])
    if op == "sw":
        return c.startswith(v)
    if op == "nu":
        return c.isNull()
    if op == "nn":
        return c.isNotNull()
    raise ValueError(f"where op {op!r}")


def _where_exprs(cnf: list[list[tuple]]) -> list:
    """One Catalyst Column per CNF clause (OR within a clause) — used
    where a Spark residual IS available (top-k scan), so, unlike
    :func:`_validate_where` consumers, any Spark-coercible literal is
    acceptable: Spark's own comparison semantics define the answer."""
    from functools import reduce
    from operator import or_

    return [reduce(or_, (_pred_expr(p) for p in clause)) for clause in cnf]


def _chunk_mask(fplan: dict, batch, i: int, n: int):
    """Evaluate a filter plan against one chunk: returns ``None`` (no
    filters), the string ``"skip"`` (chunk-level zone/Bloom prune or
    all-miss row mask), or a boolean numpy keep-mask of length n.

    Per-column evaluation prefers the dictionary domain
    (``_encoded_filter_ctx``) — the same machinery the named source's
    row filters use — and falls back to a full chunk decode +
    ``_pred_mask`` for heavy codecs. A ``_pred_mask`` None here is a
    bug (literals were validated driver-side), so it raises."""
    if not fplan["preds"]:
        return None
    import json as _json

    from fhirflat_spark.sources.datasource import (
        _bloom_keeps,
        _encoded_filter_ctx,
        _encoded_pred_mask,
        _pred_mask,
        _zone_keeps,
    )

    if fplan["zones"] or fplan["points"]:
        stats = _json.loads(batch.column("stats")[i].as_py())
        for col, lo, hi in fplan["zones"]:
            if not _zone_keeps(stats, col, fplan["type_of"][col], lo, hi):
                return "skip"
        for col, vals in fplan["points"]:
            if not _bloom_keeps(stats, col, vals):
                return "skip"
    mask = None
    ctxs = {}
    decoded = {}

    def _hit(col, op, v):
        at = fplan["arrow_of"][col]
        if col not in ctxs and col not in decoded:
            cell = batch.column(fplan["blob_of"][col])[i]
            if not cell.is_valid:  # chunk predates the column: all NULL
                decoded[col] = pa.nulls(n, type=at)
                ctxs[col] = None
            else:
                ctxs[col] = _encoded_filter_ctx(
                    memoryview(cell.as_buffer()), at
                )
                if ctxs[col] is None:
                    decoded[col] = decode_array(
                        memoryview(cell.as_buffer())
                    )
                    if decoded[col].type != at:
                        decoded[col] = decoded[col].cast(at)
        if ctxs.get(col) is not None:
            h = _encoded_pred_mask(ctxs[col], op, v)
            if isinstance(h, str):
                raise RuntimeError(
                    f"validated literal failed to coerce on {col!r}"
                )
        else:
            h = _pred_mask(decoded[col], op, v)
            if h is None:
                raise RuntimeError(
                    f"validated literal failed to coerce on {col!r}"
                )
        return h.to_numpy(zero_copy_only=False).astype(bool)

    for clause in fplan["preds"]:
        cmask = None
        for col, op, v in clause:
            hm = _hit(col, op, v)
            cmask = hm if cmask is None else (cmask | hm)
        mask = cmask if mask is None else (mask & cmask)
        if not mask.any():
            return "skip"
    return mask


def _plan_scan(spark: SparkSession, out_dir: str, cols: list[str],
               snapshot, where=None, only_part_ids=None):
    """Shared chunk-store scan plan: live/snapshot part pruning + nested
    payload projection of exactly the needed columns. Returns
    (pruned DataFrame with n_rows + one blob col per requested column,
    spark field per column, filter plan for ``_chunk_mask``).

    ``where`` — one ``(col, op, literal)``, a conjunctive list, or CNF
    (list elements that are themselves lists of predicates OR within
    the clause); ops eq/lt/le/gt/ge/in/sw/nu/nn. Pushdown stacks
    exactly like the named source: partition-level manifest zones →
    chunk-level zones + Bloom → dictionary-domain (or decoded) row
    masks — a disjunctive clause prunes by its union range and is
    masked branch-wise (OR of branch hits) — except here the result
    is FINAL (no Spark residual), so literals/types are validated
    up front and refused when exactness cannot be guaranteed."""
    from fhirflat_spark.decode import (
        _check_version,
        _live_part_ids,
        _part_range_predicate,
    )
    from fhirflat_spark.encode import chunk_schema
    from fhirflat_spark.manifest import (
        active_delete_files,
        read_summary,
        resolve_snapshot,
        snapshot_part_ids,
    )

    summary = read_summary(spark, out_dir)
    _check_version(summary)
    all_cols = summary["columns"]
    preds = _normalize_where(where)
    flat = _flat_preds(preds)
    scan_cols = list(cols) + [
        c for c in dict.fromkeys(p[0] for p in flat) if c not in cols
    ]
    for c in scan_cols:
        if c not in all_cols:
            raise ValueError(f"column {c!r} not in dataset columns {all_cols}")
    if snapshot is not None:
        snapshot = resolve_snapshot(out_dir, snapshot)
    if active_delete_files(out_dir, snapshot):
        raise ValueError(
            "dataset has active row-level deletes: encoded-domain "
            "aggregation reads physical chunks — run compact_table to "
            "materialize deletes, or aggregate via decode_table().groupBy"
        )
    full = T.StructType.fromJson(json.loads(summary["spark_schema"]))
    by_name = {f.name: f for f in full.fields}
    for c in cols:
        if isinstance(by_name[c].dataType,
                      (T.ArrayType, T.MapType, T.StructType)):
            raise ValueError(
                f"column {c!r} is nested ({by_name[c].dataType.simpleString()})"
                " — encoded-domain aggregation supports scalar columns"
            )
    _validate_where(preds, by_name, spark)
    zones = _where_zones(preds)
    type_of = {p[0]: by_name[p[0]].dataType for p in flat}
    # Bloom probes come from UNIT clauses only: an OR'd eq/in cannot
    # prune a chunk on its own branch's absence
    points = [
        (c, [v] if op == "eq" else list(v))
        for clause in preds
        if len(clause) == 1
        for c, op, v in clause
        if op in ("eq", "in")
        and c in set(summary.get("bloom_columns", ()))
    ]
    if snapshot is not None:
        ids = snapshot_part_ids(out_dir, snapshot)
    else:
        ids = _live_part_ids(out_dir)
    if zones and ids is not None:
        # partition-level pruning from the manifest's column zones —
        # metadata-only, before any chunk file is listed
        from fhirflat_spark.manifest import prune_part_ids_by_zones

        ids = prune_part_ids_by_zones(out_dir, ids, zones, type_of)
    if only_part_ids is not None:
        # caller-supplied restriction (metadata-tier split): intersect
        # with our own pruning — may legitimately be empty
        only = {int(p) for p in only_part_ids}
        ids = sorted(only) if ids is None else sorted(set(ids) & only)
    field_of = {c: f"__c{i}" for i, c in enumerate(all_cols)}
    chunks = spark.read.schema(chunk_schema(len(all_cols))).parquet(
        f"{out_dir}/chunks"
    )
    if snapshot is not None:
        if ids is not None:
            chunks = chunks.where(F.col("part_id").isin(ids))
    elif ids is not None:
        chunks = chunks.where(_part_range_predicate(ids))
    pruned = chunks.select(
        "n_rows",
        *(["stats"] if preds else []),
        *[F.col(f"payload.{field_of[c]}").alias(f"__b{j}")
          for j, c in enumerate(scan_cols)],
    )
    fplan = {
        "preds": preds,
        "zones": zones,
        "points": points,
        "type_of": type_of,
        "arrow_of": {
            p[0]: _arrow_field(spark, by_name[p[0]]) for p in flat
        },
        "blob_of": {
            c: f"__b{scan_cols.index(c)}"
            for c in dict.fromkeys(p[0] for p in flat)
        },
    }
    return pruned, [by_name[c] for c in cols], fplan


def _arrow_field(spark, field: T.StructField) -> pa.DataType:
    from fhirflat_spark.decode import _arrow_types

    return _arrow_types(spark, T.StructType([field]))[0]


def group_count_encoded(spark: SparkSession, out_dir: str,
                        column: str | list[str],
                        snapshot: int | str | None = None,
                        where=None) -> DataFrame:
    """``SELECT column(s), COUNT(*) AS cnt FROM dataset [WHERE ...]
    GROUP BY ...`` computed on the encoded chunks — dict/rle/constant
    chunks never materialize a row's value (see module docstring).
    Exact, including the NULL group(s). A list of columns groups on the
    tuple: per chunk the per-column code streams combine into one
    mixed-radix id, so the distinct work is O(rows) integer ops +
    O(distinct tuples) value touches. ``where`` pushes conjunctive
    predicates down the zone → Bloom → dictionary-domain row-mask tower
    (see ``_plan_scan``); exactness is validated up front since no
    residual re-check exists."""
    if isinstance(column, (list, tuple)):
        return _group_count_multi(spark, out_dir, list(column), snapshot,
                                  where=where)
    pruned, (gfield,), fplan = _plan_scan(spark, out_dir, [column],
                                          snapshot, where=where)
    at = _arrow_field(spark, gfield)
    out_pa = pa.schema([pa.field("k", at), pa.field("cnt", pa.int64())])

    def kernel(batches):
        from fhirflat_spark.decode import _blob_view

        keys: list[pa.Array] = []
        counts: list[np.ndarray] = []
        null_cnt = 0
        for batch in batches:
            nrs = batch.column("n_rows")
            blobs = batch.column("__b0")
            for i in range(batch.num_rows):  # chunk granularity (~16k rows)
                n = nrs[i].as_py()
                m = _chunk_mask(fplan, batch, i, n)
                if isinstance(m, str):  # zone/Bloom/row-mask chunk skip
                    continue
                if not blobs[i].is_valid:
                    # schema evolution: chunk predates the column
                    null_cnt += n if m is None else int(m.sum())
                    continue
                if m is None:
                    vals, cnts, nc = _keys_counts(_blob_view(blobs, i))
                else:
                    # filtered: needs row alignment — codes path
                    codes, kys = _codes_keys(_blob_view(blobs, i))
                    codes = codes[m]
                    nc = int((codes < 0).sum())
                    posc = codes[codes >= 0]
                    if isinstance(kys, pa.ChunkedArray):
                        kys = kys.combine_chunks()
                    cnts = np.bincount(
                        posc, minlength=len(kys)
                    ).astype(np.int64)
                    nz = np.flatnonzero(cnts)
                    vals = kys.take(pa.array(nz)) if len(nz) else None
                    cnts = cnts[nz]
                null_cnt += nc
                if vals is not None and len(vals):
                    keys.append(vals.cast(at))
                    counts.append(cnts)
        if not keys and not null_cnt:
            return
        if keys:
            t = pa.table({
                "k": pa.concat_arrays(
                    [k.combine_chunks() if isinstance(k, pa.ChunkedArray)
                     else k for k in keys]
                ),
                "cnt": pa.array(np.concatenate(counts), type=pa.int64()),
            })
            merged = t.group_by("k").aggregate([("cnt", "sum")])
            kcol = merged.column("k").combine_chunks()
            ccol = merged.column("cnt_sum").cast(pa.int64()).combine_chunks()
        else:
            kcol = pa.array([], type=at)
            ccol = pa.array([], type=pa.int64())
        if null_cnt:
            kcol = pa.concat_arrays([kcol, pa.nulls(1, type=at)])
            ccol = pa.concat_arrays(
                [ccol, pa.array([null_cnt], type=pa.int64())]
            )
        yield pa.RecordBatch.from_arrays([kcol, ccol], schema=out_pa)

    partial = T.StructType([
        T.StructField("k", gfield.dataType, True),
        T.StructField("cnt", T.LongType(), False),
    ])
    partials = pruned.mapInArrow(kernel, schema=partial)
    return (
        partials.groupBy("k").agg(F.sum("cnt").alias("cnt"))
        .withColumnRenamed("k", column)
    )


_BUCKET_US = {
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "week": 7 * 86_400_000_000,
}
# date_trunc('week') starts Monday; 1970-01-01 was a Thursday, so week
# buckets anchor 3 days BEFORE the epoch (both Spark and DuckDB agree)
_WEEK_ANCHOR_US = -3 * 86_400_000_000


def group_timebucket_encoded(spark: SparkSession, out_dir: str,
                             ts_col: str, bucket: str = "day",
                             snapshot: int | str | None = None,
                             where=None) -> DataFrame:
    """``SELECT date_trunc(bucket, ts) AS bucket, COUNT(*) AS cnt FROM
    dataset [WHERE ...] GROUP BY 1`` computed on the encoded chunks —
    the ad-hoc time-series histogram (events per day/hour) without a
    rollup table. Each task reads ONLY the timestamp column's chunk
    bytes, floor-divides the epoch-micros view by the bucket width
    (week buckets anchor to the epoch's preceding Monday, matching
    ``date_trunc``), and emits per-bucket partials — the exchange
    carries |tasks|×|buckets| rows at any table size. NULL timestamps
    group under the NULL bucket (SQL ``date_trunc(NULL) = NULL``).

    Restricted to TimestampNTZType columns: the session-tz
    TimestampType truncates in wall-clock space, which is session
    state, not data — use a rollup with an explicit zone instead.
    ``where`` composes exactly like every other encoded aggregate
    (zones → Bloom → row masks; ``_plan_scan``)."""
    if bucket not in _BUCKET_US:
        raise ValueError(
            f"bucket {bucket!r}: expected one of {sorted(_BUCKET_US)} "
            "(fixed-width buckets only — months vary)"
        )
    step = _BUCKET_US[bucket]
    anchor = _WEEK_ANCHOR_US if bucket == "week" else 0
    pruned, (tfield,), fplan = _plan_scan(spark, out_dir, [ts_col],
                                          snapshot, where=where)
    if not isinstance(tfield.dataType, T.TimestampNTZType):
        raise ValueError(
            f"time-bucket column {ts_col!r} "
            f"({tfield.dataType.simpleString()}): only TIMESTAMP_NTZ "
            "buckets are engine-neutral (session-tz timestamps truncate "
            "in session wall-clock space)"
        )
    at = _arrow_field(spark, tfield)
    out_pa = pa.schema([pa.field("b", at), pa.field("cnt", pa.int64())])

    def kernel(batches):
        from fhirflat_spark.decode import _blob_view

        agg: dict[int, int] = {}
        null_cnt = 0
        for batch in batches:
            nrs = batch.column("n_rows")
            blobs = batch.column("__b0")
            for i in range(batch.num_rows):
                n = nrs[i].as_py()
                m = _chunk_mask(fplan, batch, i, n)
                if isinstance(m, str):
                    continue
                if not blobs[i].is_valid:  # chunk predates the column
                    null_cnt += n if m is None else int(m.sum())
                    continue
                arr = decode_array(_blob_view(blobs, i))
                if arr.type != at:
                    arr = arr.cast(at)
                if m is not None:
                    arr = arr.filter(pa.array(m))
                null_cnt += arr.null_count
                if arr.null_count:
                    arr = arr.drop_null()
                if not len(arr):
                    continue
                micros = arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
                bk = np.floor_divide(micros - anchor, step) * step + anchor
                u, c = np.unique(bk, return_counts=True)
                for b_, c_ in zip(u.tolist(), c.tolist()):
                    agg[b_] = agg.get(b_, 0) + int(c_)
        if not agg and not null_cnt:
            return
        ks = sorted(agg)
        kcol = pa.array(ks, type=pa.int64()).cast(at)
        ccol = pa.array([agg[k] for k in ks], type=pa.int64())
        if null_cnt:
            kcol = pa.concat_arrays([kcol, pa.nulls(1, type=at)])
            ccol = pa.concat_arrays(
                [ccol, pa.array([null_cnt], type=pa.int64())]
            )
        yield pa.RecordBatch.from_arrays([kcol, ccol], schema=out_pa)

    partial = T.StructType([
        T.StructField("b", tfield.dataType, True),
        T.StructField("cnt", T.LongType(), False),
    ])
    partials = pruned.mapInArrow(kernel, schema=partial)
    return (
        partials.groupBy("b").agg(F.sum("cnt").alias("cnt"))
        .withColumnRenamed("b", "bucket")
    )


def _group_count_multi(spark: SparkSession, out_dir: str,
                       cols: list[str], snapshot,
                       radix_cap: int = 1 << 62,
                       where=None) -> DataFrame:
    """Tuple GROUP BY in the encoded domain. Per chunk, each column's
    code stream (code -1 = NULL, shifted +1) becomes a digit in a
    mixed-radix combined id; ``np.unique`` over the ids yields the
    distinct tuples + counts, and only those distinct tuples ever touch
    the value arrays (``keys.take``). If the radix product would
    overflow int64 (pathological per-chunk cardinalities) the chunk
    falls back to materialize + Arrow hash group-by — same result."""
    if len(cols) < 2:
        raise ValueError("_group_count_multi needs >= 2 columns")
    pruned, gfields, fplan = _plan_scan(spark, out_dir, cols, snapshot,
                                        where=where)
    ats = [_arrow_field(spark, f) for f in gfields]
    out_pa = pa.schema(
        [pa.field(f"k{j}", at) for j, at in enumerate(ats)]
        + [pa.field("cnt", pa.int64())]
    )

    def kernel(batches):
        from fhirflat_spark.decode import _blob_view

        parts: list[pa.Table] = []
        for batch in batches:
            nrs = batch.column("n_rows")
            bcols = [batch.column(f"__b{j}") for j in range(len(cols))]
            for i in range(batch.num_rows):
                n = nrs[i].as_py()
                if n == 0:
                    continue
                m = _chunk_mask(fplan, batch, i, n)
                if isinstance(m, str):
                    continue
                codes_l, keys_l = [], []
                for j in range(len(cols)):
                    if bcols[j][i].is_valid:
                        cds, kys = _codes_keys(_blob_view(bcols[j], i))
                    else:  # chunk predates the column: all-NULL digit
                        cds = np.full(n, -1, dtype=np.int64)
                        kys = pa.array([], type=ats[j])
                    if isinstance(kys, pa.ChunkedArray):
                        kys = kys.combine_chunks()
                    codes_l.append(cds if m is None else cds[m])
                    keys_l.append(kys.cast(ats[j]))
                if m is not None:
                    n = int(m.sum())
                    if n == 0:
                        continue
                radices = [len(k) + 1 for k in keys_l]
                prod = 1
                for r in radices:
                    prod *= r
                if prod < radix_cap:
                    combined = np.zeros(n, dtype=np.int64)
                    for cds, r in zip(codes_l, radices):
                        combined = combined * r + (cds + 1)
                    uniq, cnts = np.unique(combined, return_counts=True)
                    digits = []
                    rem = uniq
                    for r in reversed(radices):
                        digits.append(rem % r)
                        rem = rem // r
                    digits.reverse()
                    arrays = {}
                    for j, (d, kys) in enumerate(zip(digits, keys_l)):
                        d0 = d - 1  # back to -1 = NULL
                        idx = pa.array(d0, mask=d0 < 0)
                        arrays[f"k{j}"] = kys.take(idx)
                    arrays["cnt"] = pa.array(cnts.astype(np.int64))
                    parts.append(pa.table(arrays))
                else:  # per-chunk fallback: materialize + hash group-by
                    t = pa.table({
                        f"k{j}": kys.take(
                            pa.array(cds, mask=cds < 0)
                        )
                        for j, (cds, kys) in enumerate(zip(codes_l, keys_l))
                    })
                    agg = t.group_by(
                        [f"k{j}" for j in range(len(cols))],
                        use_threads=False,
                    ).aggregate([([], "count_all")])
                    parts.append(pa.table(
                        {f"k{j}": agg.column(f"k{j}")
                         for j in range(len(cols))}
                        | {"cnt": agg.column("count_all").cast(pa.int64())}
                    ))
        if not parts:
            return
        allp = pa.concat_tables(parts)
        merged = allp.group_by([f"k{j}" for j in range(len(cols))],
                               use_threads=False).aggregate([("cnt", "sum")])
        yield pa.RecordBatch.from_arrays(
            [merged.column(f"k{j}").combine_chunks().cast(ats[j])
             for j in range(len(cols))]
            + [merged.column("cnt_sum").cast(pa.int64()).combine_chunks()],
            schema=out_pa,
        )

    partial = T.StructType(
        [T.StructField(f"k{j}", f.dataType, True)
         for j, f in enumerate(gfields)]
        + [T.StructField("cnt", T.LongType(), False)]
    )
    partials = pruned.mapInArrow(kernel, schema=partial)
    merged = partials.groupBy(*[f"k{j}" for j in range(len(cols))]).agg(
        F.sum("cnt").alias("cnt")
    )
    for j, c in enumerate(cols):
        merged = merged.withColumnRenamed(f"k{j}", c)
    return merged


def _check_integral(vfield: T.StructField, value_col: str) -> None:
    if not isinstance(vfield.dataType,
                      (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        raise ValueError(
            f"value column {value_col!r} is "
            f"{vfield.dataType.simpleString()} — integral columns only "
            "(float partial sums are not bit-exact)"
        )


def group_agg_encoded(spark: SparkSession, out_dir: str,
                      group_col: str | list[str],
                      value_col: str,
                      snapshot: int | str | None = None,
                      where=None) -> DataFrame:
    """``SELECT g, COUNT(*), COUNT(v), SUM(v), MIN(v), MAX(v) GROUP BY
    g`` with the GROUP side kept in the encoded domain (codes, not
    values) and the value column decoded once per chunk. Output columns:
    ``group_col(s), cnt, count_{v}, sum_{v}, min_{v}, max_{v}`` —
    ``count_{v}`` is the NON-NULL value count (AVG's denominator;
    ``cnt`` counts rows). A list of group columns groups on the tuple
    (mixed-radix combined codes, as in :func:`group_count_encoded`).

    ``value_col`` is integral — int64 partial sums stay bit-exact
    under re-aggregation (the same reason manifest col_sums track only
    integer columns; float partial sums drift) — or (single group
    column only) a string, where the aggregate is ``cnt, MIN, MAX``
    with no SUM (binary-collated string min/max re-aggregates exactly;
    arrow's byte-wise UTF-8 comparison equals Spark's). ``where`` as in
    :func:`group_count_encoded`."""
    if isinstance(group_col, (list, tuple)):
        return _group_agg_multi(spark, out_dir, list(group_col), value_col,
                                snapshot, where=where)
    pruned, (gfield, vfield), fplan = _plan_scan(
        spark, out_dir, [group_col, value_col], snapshot, where=where
    )
    is_str = isinstance(vfield.dataType, T.StringType)
    if not is_str:
        _check_integral(vfield, value_col)
    gat = _arrow_field(spark, gfield)
    vat = pa.string() if is_str else pa.int64()
    out_fields = [pa.field("k", gat), pa.field("cnt", pa.int64()),
                  pa.field("vc", pa.int64())]
    if not is_str:
        out_fields.append(pa.field("s", pa.int64()))
    out_fields += [pa.field("mn", vat), pa.field("mx", vat)]
    out_pa = pa.schema(out_fields)

    def kernel(batches):
        import pyarrow.compute as pc

        from fhirflat_spark.decode import _blob_view

        parts: list[pa.Table] = []
        for batch in batches:
            nrs = batch.column("n_rows")
            gblobs = batch.column("__b0")
            vblobs = batch.column("__b1")
            for i in range(batch.num_rows):
                n = nrs[i].as_py()
                if n == 0:
                    continue
                m = _chunk_mask(fplan, batch, i, n)
                if isinstance(m, str):
                    continue
                if gblobs[i].is_valid:
                    codes, keys = _codes_keys(_blob_view(gblobs, i))
                else:
                    codes = np.full(n, -1, dtype=np.int64)
                    keys = pa.array([], type=gat)
                if vblobs[i].is_valid:
                    vals = decode_array(_blob_view(vblobs, i)).cast(vat)
                else:
                    vals = pa.nulls(n, type=vat)
                if m is not None:
                    codes = codes[m]
                    vals = vals.filter(pa.array(m))
                    if len(codes) == 0:
                        continue
                # group ids shifted +1: 0 is the NULL group
                t = pa.table({"g": pa.array(codes + 1), "v": vals})
                # ("v","count") defaults to only_valid — the non-null
                # count COUNT(v) needs (AVG's denominator); ("g","count")
                # is the row count (group codes are never null)
                agg = t.group_by("g").aggregate(
                    ([] if is_str else [("v", "sum")])
                    + [("v", "min"), ("v", "max"), ("v", "count"),
                       ("g", "count")]
                )
                g = agg.column("g").to_numpy(zero_copy_only=False)
                kc = pa.concat_arrays([
                    pa.nulls(1, type=gat),
                    keys.cast(gat).combine_chunks()
                    if isinstance(keys, pa.ChunkedArray) else keys.cast(gat),
                ])
                cols = {
                    "k": kc.take(pa.array(g)),
                    "cnt": agg.column("g_count").cast(pa.int64()),
                    "vc": agg.column("v_count").cast(pa.int64()),
                }
                if not is_str:
                    cols["s"] = agg.column("v_sum").cast(pa.int64())
                cols["mn"] = agg.column("v_min").cast(vat)
                cols["mx"] = agg.column("v_max").cast(vat)
                parts.append(pa.table(cols))
        if not parts:
            return
        allp = pa.concat_tables(parts)
        # second-level (task-wide) merge: SUM of partial sums must keep
        # SQL semantics — arrow hash_sum skips nulls but returns 0 (not
        # NULL) when min_count=0; min_count=1 preserves all-NULL -> NULL
        opts = pc.ScalarAggregateOptions(min_count=1)
        merged = allp.group_by("k").aggregate(
            [("cnt", "sum"), ("vc", "sum")]
            + ([] if is_str else [("s", "sum", opts)])
            + [("mn", "min", opts), ("mx", "max", opts)]
        )
        arrays = [
            merged.column("k").combine_chunks().cast(gat),
            merged.column("cnt_sum").cast(pa.int64()).combine_chunks(),
            merged.column("vc_sum").cast(pa.int64()).combine_chunks(),
        ]
        if not is_str:
            arrays.append(
                merged.column("s_sum").cast(pa.int64()).combine_chunks())
        arrays += [
            merged.column("mn_min").cast(vat).combine_chunks(),
            merged.column("mx_max").cast(vat).combine_chunks(),
        ]
        yield pa.RecordBatch.from_arrays(arrays, schema=out_pa)

    vst = vfield.dataType if is_str else T.LongType()
    partial = T.StructType(
        [
            T.StructField("k", gfield.dataType, True),
            T.StructField("cnt", T.LongType(), False),
            T.StructField("vc", T.LongType(), False),
        ]
        + ([] if is_str else [T.StructField("s", T.LongType(), True)])
        + [
            T.StructField("mn", vst, True),
            T.StructField("mx", vst, True),
        ]
    )
    partials = pruned.mapInArrow(kernel, schema=partial)
    aggs = [F.sum("cnt").alias("cnt"),
            F.sum("vc").alias(f"count_{value_col}")]
    if not is_str:
        aggs.append(F.sum("s").alias(f"sum_{value_col}"))
    aggs += [
        F.min("mn").alias(f"min_{value_col}"),
        F.max("mx").alias(f"max_{value_col}"),
    ]
    return (
        partials.groupBy("k").agg(*aggs).withColumnRenamed("k", group_col)
    )


def group_avg_encoded(spark: SparkSession, out_dir: str,
                      group_col: str | list[str], value_col: str,
                      snapshot: int | str | None = None,
                      where=None) -> DataFrame:
    """``SELECT g, AVG(v) GROUP BY g`` from the encoded domain. Exact
    SQL AVG semantics via the exact integer partials: the int64 SUM and
    the non-null COUNT from :func:`group_agg_encoded` re-aggregate
    bit-exactly, and the single final division ``sum / count`` is one
    IEEE-754 double op — deterministic and engine-identical (unlike a
    double RUNNING sum, whose value depends on accumulation order).
    All-NULL groups yield NULL (NULL sum propagates through the
    division). Output: ``group_col(s), count_{v}, avg_{v}``."""
    from fhirflat_spark.manifest import read_summary

    summary = read_summary(spark, out_dir)
    full = T.StructType.fromJson(json.loads(summary["spark_schema"]))
    if value_col in {f.name for f in full.fields}:
        _check_integral(full[value_col], value_col)  # strings have no SUM
    agg = group_agg_encoded(spark, out_dir, group_col, value_col,
                            snapshot=snapshot, where=where)
    gcols = [group_col] if isinstance(group_col, str) else list(group_col)
    return agg.select(
        *gcols,
        F.col(f"count_{value_col}"),
        (F.col(f"sum_{value_col}").cast("double")
         / F.col(f"count_{value_col}")).alias(f"avg_{value_col}"),
    )


def _group_agg_multi(spark: SparkSession, out_dir: str, gcols: list[str],
                     value_col: str, snapshot,
                     radix_cap: int = 1 << 62, where=None) -> DataFrame:
    """Tuple-grouped COUNT/SUM/MIN/MAX: the group columns stay encoded
    (mixed-radix combined code stream), the value column decodes once
    per chunk; Arrow's hash aggregate runs over small ints and the
    distinct tuples materialize once per chunk, never per row."""
    if len(gcols) < 2:
        raise ValueError("_group_agg_multi needs >= 2 group columns")
    pruned, fields, fplan = _plan_scan(spark, out_dir, gcols + [value_col],
                                       snapshot, where=where)
    gfields, vfield = fields[:-1], fields[-1]
    _check_integral(vfield, value_col)
    ats = [_arrow_field(spark, f) for f in gfields]
    kf = [pa.field(f"k{j}", at) for j, at in enumerate(ats)]
    out_pa = pa.schema(kf + [
        pa.field("cnt", pa.int64()), pa.field("vc", pa.int64()),
        pa.field("s", pa.int64()),
        pa.field("mn", pa.int64()), pa.field("mx", pa.int64()),
    ])
    nk = len(gcols)

    def kernel(batches):
        import pyarrow.compute as pc

        from fhirflat_spark.decode import _blob_view

        parts: list[pa.Table] = []
        for batch in batches:
            nrs = batch.column("n_rows")
            bcols = [batch.column(f"__b{j}") for j in range(nk + 1)]
            for i in range(batch.num_rows):
                n = nrs[i].as_py()
                if n == 0:
                    continue
                m = _chunk_mask(fplan, batch, i, n)
                if isinstance(m, str):
                    continue
                codes_l, keys_l = [], []
                for j in range(nk):
                    if bcols[j][i].is_valid:
                        cds, kys = _codes_keys(_blob_view(bcols[j], i))
                    else:
                        cds = np.full(n, -1, dtype=np.int64)
                        kys = pa.array([], type=ats[j])
                    if isinstance(kys, pa.ChunkedArray):
                        kys = kys.combine_chunks()
                    codes_l.append(cds if m is None else cds[m])
                    keys_l.append(kys.cast(ats[j]))
                if bcols[nk][i].is_valid:
                    vals = decode_array(
                        _blob_view(bcols[nk], i)
                    ).cast(pa.int64())
                else:
                    vals = pa.nulls(n, type=pa.int64())
                if m is not None:
                    vals = vals.filter(pa.array(m))
                    n = int(m.sum())
                    if n == 0:
                        continue
                radices = [len(k) + 1 for k in keys_l]
                prod = 1
                for r in radices:
                    prod *= r
                if prod < radix_cap:
                    combined = np.zeros(n, dtype=np.int64)
                    for cds, r in zip(codes_l, radices):
                        combined = combined * r + (cds + 1)
                    t = pa.table({"g": pa.array(combined), "v": vals})
                    agg = t.group_by("g", use_threads=False).aggregate(
                        [("v", "sum"), ("v", "min"), ("v", "max"),
                         ("v", "count"), ("g", "count")]
                    )
                    g = agg.column("g").to_numpy(zero_copy_only=False)
                    arrays = {}
                    rem = g
                    digits = []
                    for r in reversed(radices):
                        digits.append(rem % r)
                        rem = rem // r
                    digits.reverse()
                    for j, (d, kys) in enumerate(zip(digits, keys_l)):
                        d0 = d - 1
                        arrays[f"k{j}"] = kys.take(
                            pa.array(d0, mask=d0 < 0)
                        )
                else:  # overflow fallback: materialize the group tuple
                    t = pa.table(
                        {f"k{j}": kys.take(pa.array(cds, mask=cds < 0))
                         for j, (cds, kys) in
                         enumerate(zip(codes_l, keys_l))}
                        | {"v": vals}
                    )
                    agg = t.group_by(
                        [f"k{j}" for j in range(nk)], use_threads=False
                    ).aggregate(
                        [("v", "sum"), ("v", "min"), ("v", "max"),
                         ("v", "count"), ([], "count_all")]
                    )
                    arrays = {f"k{j}": agg.column(f"k{j}")
                              for j in range(nk)}
                cnt_col = (
                    agg.column("g_count") if "g_count" in agg.column_names
                    else agg.column("count_all")
                )
                arrays["cnt"] = cnt_col.cast(pa.int64())
                arrays["vc"] = agg.column("v_count").cast(pa.int64())
                arrays["s"] = agg.column("v_sum").cast(pa.int64())
                arrays["mn"] = agg.column("v_min").cast(pa.int64())
                arrays["mx"] = agg.column("v_max").cast(pa.int64())
                parts.append(pa.table(arrays))
        if not parts:
            return
        allp = pa.concat_tables(parts)
        opts = pc.ScalarAggregateOptions(min_count=1)
        merged = allp.group_by(
            [f"k{j}" for j in range(nk)], use_threads=False
        ).aggregate([
            ("cnt", "sum"), ("vc", "sum"), ("s", "sum", opts),
            ("mn", "min", opts), ("mx", "max", opts),
        ])
        yield pa.RecordBatch.from_arrays(
            [merged.column(f"k{j}").combine_chunks().cast(ats[j])
             for j in range(nk)]
            + [merged.column("cnt_sum").cast(pa.int64()).combine_chunks(),
               merged.column("vc_sum").cast(pa.int64()).combine_chunks(),
               merged.column("s_sum").cast(pa.int64()).combine_chunks(),
               merged.column("mn_min").cast(pa.int64()).combine_chunks(),
               merged.column("mx_max").cast(pa.int64()).combine_chunks()],
            schema=out_pa,
        )

    partial = T.StructType(
        [T.StructField(f"k{j}", f.dataType, True)
         for j, f in enumerate(gfields)]
        + [T.StructField("cnt", T.LongType(), False),
           T.StructField("vc", T.LongType(), False),
           T.StructField("s", T.LongType(), True),
           T.StructField("mn", T.LongType(), True),
           T.StructField("mx", T.LongType(), True)]
    )
    partials = pruned.mapInArrow(kernel, schema=partial)
    merged = partials.groupBy(*[f"k{j}" for j in range(nk)]).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("vc").alias(f"count_{value_col}"),
        F.sum("s").alias(f"sum_{value_col}"),
        F.min("mn").alias(f"min_{value_col}"),
        F.max("mx").alias(f"max_{value_col}"),
    )
    for j, c in enumerate(gcols):
        merged = merged.withColumnRenamed(f"k{j}", c)
    return merged


def group_count_distinct_encoded(spark: SparkSession, out_dir: str,
                                 group_col: str, distinct_col: str,
                                 snapshot: int | str | None = None,
                                 where=None) -> DataFrame:
    """``SELECT g, COUNT(DISTINCT d) AS cntd_{d} FROM dataset GROUP BY
    g`` — exact, from the encoded domain: the distinct (g, d) pairs fall
    out of the tuple group-count (unique combined codes per chunk), so
    the shuffle carries distinct pairs, never rows; the final count is a
    Catalyst aggregate over that pair set. NULL d values don't count
    (SQL COUNT(DISTINCT) semantics); a NULL group still appears."""
    pairs = group_count_encoded(
        spark, out_dir, [group_col, distinct_col], snapshot, where=where
    )
    return pairs.groupBy(group_col).agg(
        F.sum(
            F.when(F.col(distinct_col).isNotNull(), 1).otherwise(0)
        ).cast("long").alias(f"cntd_{distinct_col}")
    )


def group_topk_encoded(spark: SparkSession, out_dir: str, group_col: str,
                       value_col: str, k: int,
                       snapshot: int | str | None = None,
                       where=None) -> DataFrame:
    """Top-``k`` most frequent ``value_col`` values per ``group_col``
    (ties broken by value ascending, NULL first — deterministic).
    Composes on the encoded pair counts, so the heavy lifting is the
    same code-stream work as :func:`group_count_encoded`; the window
    ranks |distinct pairs| rows, never the table."""
    from pyspark.sql import Window

    pairs = group_count_encoded(
        spark, out_dir, [group_col, value_col], snapshot, where=where
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("cnt").desc(), F.col(value_col).asc_nulls_first()
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= int(k)).drop("rn")
    )


def _topk_zone_threshold(out_dir: str, order_col: str, k: int,
                         snapshot: int | None, descending: bool,
                         preds: list[list[tuple]] | None = None):
    """A sound metadata-only bound for global top-``k``: every non-null
    row in a chunk is >= its zone min (string zone mins are truncated
    PREFIXES of the true min, still valid lower bounds), so walking the
    chunks by zone-min descending and accumulating non-null row counts
    until >= ``k`` yields a threshold tau with a GUARANTEED k rows at or
    above it — `order_col >= tau` can then prune every other chunk
    without losing a top-k row. Ascending mirrors via zone maxes.

    Returns None (caller falls back to an exact full scan) whenever the
    guarantee cannot be made: active row-level deletes (fragment counts
    are physical, the view is logical), any chunk with values but no
    zone (NaN-poisoned float / unsupported type / pre-zone format), any
    chunk predating stats-v2 null counts, or < k non-null rows total.

    With ``preds`` (a normalized CNF WHERE), only chunks where EVERY
    clause is metadata-entailed (:func:`_clause_entails_chunk` — all
    rows provably satisfy it) may count toward the k-row guarantee;
    partially-matching chunks contribute nothing but are still scanned,
    so tau stays sound: >= k WHERE-matching rows at-or-beyond tau are
    proven to exist before anything is pruned."""
    preds = _normalize_where(preds)  # idempotent — accepts flat or CNF
    from fhirflat_spark.decode import _live_part_ids
    from fhirflat_spark.manifest import (
        active_delete_files,
        load_fragments,
        snapshot_part_ids,
    )

    if active_delete_files(out_dir, snapshot):
        return None
    if snapshot is not None:
        ids = snapshot_part_ids(out_dir, snapshot)
    else:
        ids = _live_part_ids(out_dir)
    try:
        rows = load_fragments(f"{out_dir}/manifest_parts")
    except FileNotFoundError:
        return None
    if ids is not None:
        idset = set(ids)
        rows = [r for r in rows if r["part_id"] in idset]
    bounds = []  # (guaranteed bound, non-null rows) per chunk
    for c in rows:
        if "nulls" not in c:
            return None
        nonnull = c["n_rows"] - c["nulls"].get(order_col, c["n_rows"])
        zone = (c.get("zones") or {}).get(order_col)
        if zone is None:
            if nonnull:
                return None  # values exist but unbounded — unsafe
            continue
        if preds and not all(_clause_entails_chunk(cl, c) for cl in preds):
            continue  # can't prove its rows match — no guarantee credit
        bounds.append((zone[0] if descending else zone[1], nonnull))
    bounds.sort(key=lambda b: b[0], reverse=descending)
    acc = 0
    for bound, nonnull in bounds:
        acc += nonnull
        if acc >= k:
            return bound
    return None  # fewer than k non-null rows — nulls may reach the top-k


def topk_rows_encoded(spark: SparkSession, out_dir: str, order_col: str,
                      k: int, tiebreak_col: str,
                      columns: list[str] | None = None,
                      snapshot: int | str | None = None,
                      descending: bool = True,
                      where=None) -> DataFrame:
    """Global ``ORDER BY order_col [DESC] LIMIT k`` that derives a sound
    threshold tau from per-chunk zone metadata (:func:`_topk_zone_threshold`,
    zero data IO) and scans through the named source with
    ``order_col >= tau`` pushed down — partition zones, chunk zones and
    dictionary-domain row masks skip everything that cannot hold a
    top-k row, and Spark re-applies the exact residual. When no sound
    tau exists (deletes, NaN-poisoned zones, < k non-null rows) the
    same scan runs unfiltered — exact either way, just unpruned.

    ``tiebreak_col`` makes the result deterministic; NULL ``order_col``
    rows sort LAST in both directions (coherent with the threshold
    guarantee, which counts non-null rows — with >= k non-null rows a
    NULL can never be a top-k row). The sort itself is Spark's
    distributed TakeOrderedAndProject over only the surviving rows.

    ``where`` (same conjunctive mini-language as the encoded
    aggregates: (col, op, value) with op in eq/lt/le/gt/ge/in/sw/nu/nn)
    composes: the predicate is applied as an exact Spark residual (and
    pushed into the source for zone/Bloom/row-mask pruning), while tau
    only counts chunks whose rows PROVABLY all match, so threshold
    pruning stays sound under filters. Unlike the residual-free
    encoded aggregates, any Spark-coercible literal is accepted."""
    from fhirflat_spark.decode import _check_version
    from fhirflat_spark.manifest import read_summary, resolve_snapshot
    from fhirflat_spark.sources.datasource import register

    summary = read_summary(spark, out_dir)
    _check_version(summary)
    all_cols = summary["columns"]
    out_cols = list(columns) if columns is not None else list(all_cols)
    preds = _normalize_where(where)
    for c in {order_col, tiebreak_col, *out_cols,
              *(p[0] for p in _flat_preds(preds))}:
        if c not in all_cols:
            raise ValueError(f"column {c!r} not in dataset columns {all_cols}")
    snap = resolve_snapshot(out_dir, snapshot) if snapshot is not None else None
    full = T.StructType.fromJson(json.loads(summary["spark_schema"]))
    otype = {f.name: f.dataType for f in full.fields}[order_col]
    tau = (
        _topk_zone_threshold(out_dir, order_col, int(k), snap, descending,
                             preds)
        # zones survive the JSON round-trip comparably for exactly the
        # integral + string types (the row-level pushdown exactness set);
        # other types fall back to the unfiltered exact scan
        if isinstance(otype, (T.ByteType, T.ShortType, T.IntegerType,
                              T.LongType, T.StringType))
        else None
    )

    register(spark)
    reader = spark.read.format("fhirflat").option("path", out_dir)
    if snap is not None:
        reader = reader.option("snapshot", str(snap))
    scan_cols = list(dict.fromkeys(
        [*out_cols, order_col, tiebreak_col,
         *(p[0] for p in _flat_preds(preds))]
    ))
    if len(scan_cols) < len(all_cols):
        reader = reader.option("columns", ",".join(scan_cols))
    df = reader.load()
    for e in _where_exprs(preds):
        df = df.where(e)
    if tau is not None:
        df = df.where(
            F.col(order_col) >= F.lit(tau) if descending
            else F.col(order_col) <= F.lit(tau)
        )
    order = (
        F.col(order_col).desc_nulls_last() if descending
        else F.col(order_col).asc_nulls_last()
    )
    return (
        df.orderBy(order, F.col(tiebreak_col).asc_nulls_first())
        .limit(int(k)).select(*out_cols)
    )


def _partition_tiers(out_dir: str, preds: list[list[tuple]],
                     snapshot: int | None):
    """Classify the selected snapshot's partitions for a filtered
    aggregate: returns ``(entailed, straddle, meta)`` where
    ``entailed`` partitions' manifest rollups (col_zones + col_nulls)
    prove EVERY physical row matches the CNF where — their contribution
    comes from metadata with zero data IO, the filtered analog of
    :func:`manifest.aggregate_from_metadata` — and ``straddle`` must be
    scanned. Partitions zone-proven to have NO matching row appear in
    neither list. ``meta[pid] = (rows, zones, nulls, sums)`` (sums may
    be ``None``). Entailment is conservative (floats, missing stats,
    pre-v2 partitions decline to the scan tier), so this affects IO,
    never answers. The caller is responsible for the active-delete
    refusal (physical rollups vs logical view)."""
    import json as _json

    from fhirflat_spark import fsio
    from fhirflat_spark.maintenance import _entails_partition
    from fhirflat_spark.manifest import (
        current_snapshot,
        prune_part_ids_by_zones,
        read_snapshot_manifest,
    )

    ver = snapshot if snapshot is not None else current_snapshot(out_dir)
    if ver is None:
        return [], [], {}
    summary = _json.loads(fsio.read_bytes(f"{out_dir}/_SUMMARY.json"))
    full = T.StructType.fromJson(_json.loads(summary["spark_schema"]))
    type_of = {f.name: f.dataType for f in full.fields}
    t = read_snapshot_manifest(out_dir, ver)
    names = t.schema.names
    meta = {}
    for i in range(t.num_rows):
        if t["status"][i].as_py() != "ok":
            continue
        pid = int(t["part_id"][i].as_py())
        zj = t["col_zones"][i].as_py() if "col_zones" in names else None
        nj = t["col_nulls"][i].as_py() if "col_nulls" in names else None
        sj = t["col_sums"][i].as_py() if "col_sums" in names else None
        meta[pid] = (
            int(t["rows"][i].as_py()),
            _json.loads(zj) if zj else {},
            _json.loads(nj) if nj is not None else None,
            _json.loads(sj) if sj is not None else None,
        )
    cand = prune_part_ids_by_zones(
        out_dir, sorted(meta), _where_zones(preds), type_of
    )
    entailed, straddle = [], []
    for pid in cand:
        n_rows, zones, nulls, _sums = meta[pid]
        if n_rows == 0:
            continue
        if all(any(_entails_partition(p, n_rows, zones, nulls,
                                      type_of.get(p[0]))
                   for p in cl) for cl in preds):
            entailed.append(pid)
        else:
            straddle.append(pid)
    return entailed, straddle, meta


def count_encoded(spark: SparkSession, out_dir: str, where=None,
                  snapshot: int | str | None = None,
                  report: dict | None = None) -> int:
    """``SELECT COUNT(*) FROM dataset [WHERE ...]`` — with no filter
    this is pure chunk-header arithmetic (n_rows column; zero payload
    IO, like ``aggregate_from_metadata`` but snapshot-scoped through
    the same scan plan); with a filter, three tiers: partitions whose
    manifest rollups ENTAIL the predicate count from metadata (zero
    chunk IO), zone-missed partitions contribute nothing, and only
    straddlers read their predicate columns' bytes for the mask
    popcount. Pass a dict as ``report`` to observe the split
    (parts_metadata / parts_scanned / rows_metadata). Returns a
    Python int (the partial frame is |tasks| rows)."""
    pruned, _, fplan = _plan_scan(spark, out_dir, [], snapshot,
                                  where=where)
    if not fplan["preds"]:
        row = pruned.agg(F.sum("n_rows").alias("c")).collect()[0]
        return int(row["c"] or 0)
    # _plan_scan validated everything (version, nested cols, literal
    # exactness) and refused active deletes — the metadata tier below
    # is only sound after that refusal
    from fhirflat_spark.manifest import resolve_snapshot

    snap = resolve_snapshot(out_dir, snapshot) if snapshot is not None \
        else None
    entailed, straddle, meta = _partition_tiers(
        out_dir, fplan["preds"], snap
    )
    total = sum(meta[p][0] for p in entailed)
    if report is not None:
        report.update(
            parts_metadata=len(entailed), parts_scanned=len(straddle),
            rows_metadata=total,
        )
    if not straddle:
        return total
    pruned, _, fplan = _plan_scan(spark, out_dir, [], snapshot,
                                  where=where, only_part_ids=straddle)

    def kernel(batches):
        total = 0
        for batch in batches:
            nrs = batch.column("n_rows")
            for i in range(batch.num_rows):
                n = nrs[i].as_py()
                m = _chunk_mask(fplan, batch, i, n)
                if isinstance(m, str):
                    continue
                total += n if m is None else int(m.sum())
        yield pa.RecordBatch.from_arrays(
            [pa.array([total], type=pa.int64())], names=["c"]
        )

    partials = pruned.mapInArrow(
        kernel, schema=T.StructType([T.StructField("c", T.LongType())])
    )
    row = partials.agg(F.sum("c").alias("c")).collect()[0]
    return total + int(row["c"] or 0)


def sum_encoded(spark: SparkSession, out_dir: str, value_col: str,
                where=None,
                snapshot: int | str | None = None,
                report: dict | None = None) -> int | None:
    """``SELECT SUM(v) FROM dataset [WHERE ...]`` for an integral
    column — the value column decodes once per chunk (skipped entirely
    for zone/Bloom/row-mask-missed chunks), everything else stays
    unread. With a filter, partitions whose manifest rollups ENTAIL the
    predicate contribute their stats-v2 ``col_sums`` rollup with zero
    chunk IO (demoted to the scan tier when the sum rollup is absent
    for a partition with real values); only straddlers decode. Returns
    None for the SQL all-NULL/empty case."""
    pruned, (vfield,), fplan = _plan_scan(spark, out_dir, [value_col],
                                          snapshot, where=where)
    _check_integral(vfield, value_col)
    meta_total, meta_seen = 0, 0
    if fplan["preds"]:
        from fhirflat_spark.manifest import resolve_snapshot

        snap = resolve_snapshot(out_dir, snapshot) \
            if snapshot is not None else None
        entailed, straddle, meta = _partition_tiers(
            out_dir, fplan["preds"], snap
        )
        for pid in list(entailed):
            n_rows, _zones, nulls, sums = meta[pid]
            nonnull = n_rows - (nulls or {}).get(value_col, n_rows)
            if nonnull == 0:
                continue  # no values: contributes nothing, stays free
            if sums is None or value_col not in sums:
                # values exist but no sum rollup — scan this partition
                entailed.remove(pid)
                straddle.append(pid)
                continue
            meta_total += int(sums[value_col])
            meta_seen += 1
        if report is not None:
            report.update(
                parts_metadata=len(entailed), parts_scanned=len(straddle),
                sum_metadata=meta_total if meta_seen else None,
            )
        if not straddle:
            return meta_total if meta_seen else None
        pruned, (vfield,), fplan = _plan_scan(
            spark, out_dir, [value_col], snapshot, where=where,
            only_part_ids=straddle,
        )

    def kernel(batches):
        import pyarrow.compute as pc

        from fhirflat_spark.decode import _blob_view

        total = 0
        seen = 0
        for batch in batches:
            nrs = batch.column("n_rows")
            blobs = batch.column("__b0")
            for i in range(batch.num_rows):
                n = nrs[i].as_py()
                m = _chunk_mask(fplan, batch, i, n)
                if isinstance(m, str) or not blobs[i].is_valid:
                    continue
                vals = decode_array(_blob_view(blobs, i)).cast(pa.int64())
                if m is not None:
                    vals = vals.filter(pa.array(m))
                s = pc.sum(vals, min_count=1).as_py()
                if s is not None:
                    total += s
                    seen += 1
        yield pa.RecordBatch.from_arrays(
            [pa.array([total if seen else None], type=pa.int64())],
            names=["s"],
        )

    partials = pruned.mapInArrow(
        kernel, schema=T.StructType([T.StructField("s", T.LongType())])
    )
    row = partials.agg(F.sum("s").alias("s")).collect()[0]
    if row["s"] is None:
        return meta_total if meta_seen else None
    return meta_total + int(row["s"])


def distinct_encoded(spark: SparkSession, out_dir: str, column: str,
                     snapshot: int | str | None = None,
                     where=None) -> DataFrame:
    """``SELECT DISTINCT column`` from the encoded domain — the value
    bytes are touched once per distinct (dictionary / run values), never
    once per row."""
    return group_count_encoded(
        spark, out_dir, column, snapshot, where=where
    ).select(column)
