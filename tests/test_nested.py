"""Nested reshaping unit tests — the reference's flatten/unflatten operator
layer (reference tests/test_fhir2flat_units.py + test_flat2fhir_units.py),
driven on constructed nested rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from fhirflat_spark.nested import (
    condense_coding,
    expand_coding,
    extensions_to_map,
    flatten_structs,
    unflatten_structs,
    zip_backbone,
)


@pytest.fixture(scope="module")
def nested_df(spark):
    return spark.createDataFrame(
        [
            Row(
                id="e1",
                period=Row(start="2021-01-01", end="2021-01-09"),
                klass=[Row(system="sys", code="IMP", display="inpatient")],
                diagnosis=[
                    Row(condition="c1", use="AD"),
                    Row(condition="c2", use="DD"),
                ],
            ),
            Row(
                id="e2",
                period=Row(start="2021-02-01", end=None),
                klass=[Row(system="sys", code="AMB", display="ambulatory")],
                diagnosis=[Row(condition="c3", use="AD")],
            ),
        ]
    )


def test_flatten_dotted_names(spark, nested_df):
    flat = flatten_structs(nested_df)
    assert "period.start" in flat.columns and "period.end" in flat.columns
    # length-1 arrays of structs unwrap then flatten; >1 becomes _dense
    assert "diagnosis_dense" in flat.columns
    assert "klass.system" in flat.columns  # max len 1 -> unwrapped
    rows = {r["id"]: r for r in flat.collect()}
    assert rows["e1"]["period.start"] == "2021-01-01"
    assert rows["e1"]["klass.code"] == "IMP"
    assert len(rows["e1"]["diagnosis_dense"]) == 2


def test_unflatten_roundtrip(spark, nested_df):
    flat = flatten_structs(nested_df.select("id", "period"))
    rebuilt = unflatten_structs(flat)
    assert set(rebuilt.columns) == {"id", "period"}
    orig = {r["id"]: r["period"] for r in nested_df.select("id", "period").collect()}
    back = {r["id"]: r["period"] for r in rebuilt.collect()}
    assert {k: tuple(v) for k, v in orig.items()} == {k: tuple(v) for k, v in back.items()}


def _denull(dt):
    """Schema equality modulo nullability (F.struct output is always
    non-nullable; a NULL struct round-trips as a struct of NULLs)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.StructType):
        return T.StructType(
            [T.StructField(f.name, _denull(f.dataType), True) for f in dt.fields]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_denull(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(_denull(dt.keyType), _denull(dt.valueType), True)
    return dt


def test_unflatten_deep_roundtrip(spark):
    """Depth>=2 structs must rebuild NESTED, not with dotted inner names
    (regression: the recursion was dead code). flatten→unflatten must be
    schema-identity — the reference shape is timingDetail.high.value
    (expand_concepts recursion, flat2fhir.py:387-462)."""
    df = spark.createDataFrame(
        [
            Row(
                id="r1",
                timingDetail=Row(
                    high=Row(value=7.5, unit="d"),
                    low=Row(value=1.0, unit="d"),
                    text="weekly",
                ),
            ),
            Row(
                id="r2",
                timingDetail=Row(
                    high=Row(value=None, unit=None),
                    low=Row(value=2.0, unit="h"),
                    text=None,
                ),
            ),
        ]
    )
    flat = flatten_structs(df)
    assert "timingDetail.high.value" in flat.columns
    rebuilt = unflatten_structs(flat)
    assert _denull(rebuilt.schema) == _denull(df.schema), (
        f"schema not identity:\n{rebuilt.schema}\nvs\n{df.schema}"
    )
    assert sorted(map(str, rebuilt.collect())) == sorted(map(str, df.collect()))
    # 3 levels deep too
    df3 = spark.createDataFrame([Row(a=Row(b=Row(c=Row(d=1, e="x"), f=2), g=3))])
    flat3 = flatten_structs(df3)
    assert set(flat3.columns) == {"a.b.c.d", "a.b.c.e", "a.b.f", "a.g"}
    r3 = unflatten_structs(flat3)
    assert _denull(r3.schema) == _denull(df3.schema)
    assert r3.collect() == df3.collect()


def test_unflatten_name_conflict_raises(spark):
    df = spark.createDataFrame([(1, 2)], ["a", "a.b"])
    with pytest.raises(ValueError, match="conflict"):
        unflatten_structs(df)


def test_condense_expand_coding_roundtrip(spark, nested_df):
    df = nested_df.select("id", F.col("klass").alias("coding"))
    condensed = condense_coding(df, "coding")
    rows = {r["id"]: r for r in condensed.collect()}
    assert rows["e1"]["coding.code"] == ["sys|IMP"]
    assert rows["e1"]["coding.text"] == ["inpatient"]
    expanded = expand_coding(condensed, "coding.code", "coding.text", "coding")
    back = {r["id"]: r["coding"] for r in expanded.collect()}
    assert back["e1"][0]["system"] == "sys"
    assert back["e1"][0]["code"] == "IMP"
    assert back["e1"][0]["display"] == "inpatient"


def test_zip_backbone(spark):
    df = spark.createDataFrame(
        [("a", ["c1", "c2"], ["AD", "DD"])],
        ["id", "conditions", "uses"],
    )
    out = zip_backbone(df, "diagnosis", {"condition": "conditions", "use": "uses"})
    row = out.collect()[0]["diagnosis"]
    assert [tuple(x) for x in row] == [("c1", "AD"), ("c2", "DD")]


def test_extensions_to_map(spark):
    df = spark.createDataFrame(
        [("a", [Row(url="age", value="33"), Row(url="site", value="uk")])],
        ["id", "extension"],
    )
    out = extensions_to_map(df, "extension")
    m = out.collect()[0]["extension"]
    assert m == {"age": "33", "site": "uk"}


def test_extensions_map_roundtrip(spark):
    """extensions → map → extensions is identity (D5 inverse, reference
    create_extension flat2fhir.py:257-329)."""
    from fhirflat_spark.nested import map_to_extensions

    ext = [Row(url="age", value="33"), Row(url="site", value="uk"),
           Row(url="tz", value=None)]
    df = spark.createDataFrame([("a", ext), ("b", [])], ["id", "extension"])
    back = map_to_extensions(extensions_to_map(df, "extension"), "extension")
    assert _denull(back.schema) == _denull(df.schema)
    rows = {r["id"]: r["extension"] for r in back.collect()}
    assert [tuple(x) for x in rows["a"]] == [("age", "33"), ("site", "uk"), ("tz", None)]
    assert rows["b"] == []


def test_set_datatypes_registry_dispatch(spark):
    """D3/D4/D6: a flat table + a type registry rebuilds Quantity (with
    fused system|code split), CodeableConcept, and Period in one plan."""
    from fhirflat_spark.nested import set_datatypes

    df = spark.createDataFrame(
        [
            (
                "r1",
                5.0, "mg", "http://unitsofmeasure.org|mg",
                ["sys|IMP"], ["inpatient"],
                "2021-01-01", "2021-01-09",
            )
        ],
        [
            "id",
            "doseQuantity.value", "doseQuantity.unit", "doseQuantity.code",
            "klass.code", "klass.text",
            "period.start", "period.end",
        ],
    )
    out = set_datatypes(
        df,
        {
            "doseQuantity": "Quantity",
            "klass": "CodeableConcept",
            "period": "Period",
        },
    )
    row = out.collect()[0]
    q = row["doseQuantity"]
    assert (q["value"], q["unit"], q["system"], q["code"]) == (
        5.0, "mg", "http://unitsofmeasure.org", "mg"
    )
    k = row["klass"][0]
    assert (k["system"], k["code"], k["display"]) == ("sys", "IMP", "inpatient")
    p = row["period"]
    assert (p["start"], p["end"]) == ("2021-01-01", "2021-01-09")
    assert set(out.columns) == {"id", "doseQuantity", "klass", "period"}
    with pytest.raises(ValueError, match="no builder"):
        set_datatypes(df, {"doseQuantity": "Quantitee"})


def test_create_quantity_separate_system(spark):
    """With an explicit group.system column, code is NOT split."""
    from fhirflat_spark.nested import create_quantity

    df = spark.createDataFrame(
        [(1.5, "u", "mg", "http://unitsofmeasure.org")],
        ["q.value", "q.unit", "q.code", "q.system"],
    )
    row = create_quantity(df, "q").collect()[0]["q"]
    assert (row["value"], row["unit"], row["code"], row["system"]) == (
        1.5, "u", "mg", "http://unitsofmeasure.org"
    )


def test_flatten_then_encode_roundtrip(spark, nested_df, tmp_path):
    """Nested table -> flatten -> columnar encode -> decode -> unflatten:
    the full reference pipeline shape, bit-identical at the flat layer."""
    from fhirflat_spark.decode import decode_table
    from fhirflat_spark.encode import encode_table

    flat = flatten_structs(nested_df)
    out = str(tmp_path / "nested_ds")
    res = encode_table(flat, out, rows_per_bucket=10)
    assert res.rows == 2
    dec = decode_table(spark, out)
    assert dec.schema == flat.schema
    assert sorted(map(tuple, dec.collect())) == sorted(map(tuple, flat.collect()))


def test_flatten_unflatten_property(spark):
    """Property: for randomly-shaped struct trees, flatten → unflatten is
    schema identity (modulo nullability) and value identity."""
    import random

    from pyspark.sql import types as T

    rnd = random.Random(42)

    def rand_type(depth):
        if depth >= 3 or rnd.random() < 0.4:
            return rnd.choice(
                [T.StringType(), T.LongType(), T.DoubleType(), T.BooleanType()]
            )
        n = rnd.randint(1, 3)
        return T.StructType(
            [T.StructField(f"f{i}", rand_type(depth + 1), True) for i in range(n)]
        )

    def rand_value(dt):
        if isinstance(dt, T.StructType):
            return tuple(rand_value(f.dataType) for f in dt.fields)
        if isinstance(dt, T.StringType):
            return rnd.choice(["x", "yy", None, ""])
        if isinstance(dt, T.LongType):
            return rnd.choice([0, -5, 12345, None])
        if isinstance(dt, T.DoubleType):
            return rnd.choice([0.5, -1.25, None])
        return rnd.choice([True, False, None])

    for trial in range(6):
        n_top = rnd.randint(1, 3)
        schema = T.StructType(
            [T.StructField(f"c{i}", rand_type(0), True) for i in range(n_top)]
        )
        rows = [tuple(rand_value(f.dataType) for f in schema.fields) for _ in range(4)]
        df = spark.createDataFrame(rows, schema)
        flat = flatten_structs(df, unwrap_single_lists=False)
        back = unflatten_structs(flat)
        assert _denull(back.schema) == _denull(df.schema), (
            f"trial {trial}:\n{back.schema}\nvs\n{df.schema}"
        )
        assert sorted(map(str, back.collect())) == sorted(map(str, df.collect())), (
            f"trial {trial} values differ"
        )


def test_json_render_roundtrip(spark, nested_df):
    """F14: per-row JSON render (to_json) and parse-back (from_json) are
    inverse for the struct column."""
    df = nested_df.select("id", "period")
    rendered = df.select("id", F.to_json("period").alias("js"))
    schema = df.schema["period"].dataType
    back = rendered.select("id", F.from_json("js", schema).alias("period"))
    orig = {r["id"]: tuple(r["period"]) for r in df.collect()}
    got = {r["id"]: tuple(r["period"]) for r in back.collect()}
    assert orig == got
