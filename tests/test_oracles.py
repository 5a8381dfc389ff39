"""Cross-check every queries() entry against its DuckDB oracle at sf0.001 —
a local mirror of the driver's CORRECTNESS gate (row count + sorted-column
value comparison), so oracle drift is caught before the driver runs.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon_type(t) -> str:
    """Canonical arrow type label. Deliberately strict: int64 vs
    decimal128(38,0) (DuckDB hugeint sum widening) MUST differ — that is
    exactly the class the driver's value hash catches and the old
    stringify-based normalize masked. Only memory-layout variants of the
    same logical type are merged."""
    import pyarrow as pa

    if pa.types.is_integer(t):
        # int widths all land on python int (the driver passed an
        # int32-vs-int64 query in round 1); decimal stays distinct
        return "int"
    if pa.types.is_large_string(t):
        return "string"
    if pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return f"timestamp[{t.unit}]"  # tz-normalized
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_canon_type(t.value_type)}>"
    return str(t)


def _norm_val(v):
    if isinstance(v, float):
        v = round(v, 3)
        if math.isnan(v):
            return "nan"
    if isinstance(v, list):
        return tuple(_norm_val(x) for x in v)
    return str(v)


def _rows_sorted(tbl):
    cols = sorted(tbl.schema.names)
    data = [tbl.column(c).to_pylist() for c in cols]
    return sorted(tuple(_norm_val(v) for v in row) for row in zip(*data))


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    spark_tbl = QUERIES[name](spark, SF_DIR).toArrow()
    duck_tbl = duck.execute(ORACLES[name]).arrow()
    assert sorted(spark_tbl.schema.names) == sorted(duck_tbl.schema.names), (
        f"{name}: column names differ: "
        f"{spark_tbl.schema.names} vs {duck_tbl.schema.names}"
    )
    # type-strict: the driver hashes arrow values, so type widening
    # (e.g. DuckDB sum(int) -> decimal128) must fail HERE, pre-driver
    for col in spark_tbl.schema.names:
        st = _canon_type(spark_tbl.schema.field(col).type)
        dt = _canon_type(duck_tbl.schema.field(col).type)
        assert st == dt, f"{name}.{col}: arrow type {st} (spark) vs {dt} (oracle)"
    assert spark_tbl.num_rows == duck_tbl.num_rows, (
        f"{name}: row counts differ: {spark_tbl.num_rows} vs {duck_tbl.num_rows}"
    )
    a = _rows_sorted(spark_tbl)
    b = _rows_sorted(duck_tbl)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first mismatches: {mismatches[:3]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert all(r["chunks_failed_verification"] == 0 for r in rows)
