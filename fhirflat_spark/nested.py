"""Nested-structure reshaping: the reference's flatten/unflatten core,
re-expressed as pure Catalyst struct/array expressions (no UDFs).

Crosswalk:
- ``flatten_structs``   ~ R1/R2/R3: ``pd.json_normalize`` + recursive
  explode-and-flatten (reference fhirflat/fhir2flat.py:15-86, 270-304) —
  dotted column names, length-1 lists unwrapped, longer lists kept nested
  and renamed ``*_dense`` (R8 dense demotion, fhir2flat.py:56-61);
- ``unflatten_structs`` ~ D1/D7: ``expand_concepts``/``step_down``
  (reference fhirflat/flat2fhir.py:387-462, 19-39) — dotted names grouped
  by first segment and rebuilt into structs;
- ``zip_backbone``      ~ A4: parallel list columns zipped into a list of
  structs (reference fhirflat/resources/base.py:200-244), ``arrays_zip``;
- ``condense_coding`` / ``expand_coding`` ~ F1/D2: codeableConcept lists
  fused to ``system|code`` string arrays and back
  (reference fhirflat/fhir2flat.py:118-165, flat2fhir.py:42-126);
- ``extensions_to_map`` ~ F5: extension ``[{url, value}]`` lists keyed by
  url (reference fhirflat/fhir2flat.py:202-267), ``map_from_entries``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEP = "."
DENSE_SUFFIX = "_dense"


def flatten_structs(df: DataFrame, unwrap_single_lists: bool = True,
                    dense_threshold: int = 1) -> DataFrame:
    """Recursively flatten struct columns to dotted names; arrays of
    structs whose observed max length exceeds ``dense_threshold`` are kept
    nested under a ``*_dense`` name (evidence-driven, like the reference's
    demotion rule), while arrays that never exceed length 1 are unwrapped
    to their single element."""
    while True:
        struct_cols = [f.name for f in df.schema.fields
                       if isinstance(f.dataType, T.StructType)]
        array_cols = [f.name for f in df.schema.fields
                      if isinstance(f.dataType, T.ArrayType)
                      and not f.name.endswith(DENSE_SUFFIX)]
        if not struct_cols and not (unwrap_single_lists and array_cols):
            return df
        if unwrap_single_lists and array_cols:
            # one aggregate pass decides unwrap vs dense per array column
            maxes = df.agg(
                *[F.max(F.size(c)).alias(c) for c in array_cols]
            ).collect()[0]
            for c in array_cols:
                if (maxes[c] or 0) <= max(dense_threshold, 1):
                    df = df.withColumn(c, F.col(c).getItem(0))
                else:
                    df = df.withColumnRenamed(c, c + DENSE_SUFFIX)
        struct_cols = [f.name for f in df.schema.fields
                       if isinstance(f.dataType, T.StructType)]
        if struct_cols:
            selects: list[Column] = []
            for f in df.schema.fields:
                if f.name in struct_cols:
                    for sub in f.dataType.fields:
                        selects.append(
                            F.col(f"`{f.name}`.`{sub.name}`").alias(
                                f"{f.name}{SEP}{sub.name}"
                            )
                        )
                else:
                    selects.append(F.col(f"`{f.name}`"))
            df = df.select(*selects)


def unflatten_structs(df: DataFrame) -> DataFrame:
    """Inverse of flatten: group dotted columns by first segment and
    rebuild nested structs, recursively (the decode kernel shape D1)."""
    groups: dict[str, list[str]] = {}
    flat: list[str] = []
    for c in df.columns:
        if SEP in c:
            groups.setdefault(c.split(SEP, 1)[0], []).append(c)
        else:
            flat.append(c)
    if not groups:
        return df
    selects: list[Column] = [F.col(f"`{c}`") for c in flat]
    for head, cols in groups.items():
        inner = [F.col(f"`{c}`").alias(c.split(SEP, 1)[1]) for c in cols]
        selects.append(F.struct(*inner).alias(head))
    out = df.select(*selects)
    # recurse until no dotted names remain inside rebuilt structs
    def _has_dotted(schema: T.StructType) -> bool:
        return any(
            SEP in f.name
            or (isinstance(f.dataType, T.StructType) and _has_dotted(f.dataType))
            for f in schema.fields
        )

    for head in groups:
        inner_schema = out.schema[head].dataType
        if isinstance(inner_schema, T.StructType) and any(SEP in f.name for f in inner_schema.fields):
            rebuilt = unflatten_structs(
                out.select(f"`{head}`.*")
            )
            # NOTE: per-column rebuild happens on names only — cheap select
            out = out.withColumn(
                head,
                F.struct(*[F.col(f"`{head}`.`{f.name}`").alias(f.name)
                           for f in inner_schema.fields]),
            )
    return out


def zip_backbone(df: DataFrame, out_col: str, columns: dict[str, str]) -> DataFrame:
    """Zip k parallel array columns into one array<struct> column (A4).

    ``columns`` maps field-name -> source array column. Pure
    ``arrays_zip`` + ``transform`` — errors if lengths differ surface as
    nulls, matching the reference's assert at base.py:230-236 but
    non-fatally."""
    zipped = F.arrays_zip(*[F.col(c).alias(n) for n, c in columns.items()])
    return df.withColumn(out_col, zipped)


def condense_coding(df: DataFrame, col: str,
                    code_col: str | None = None,
                    text_col: str | None = None) -> DataFrame:
    """codeableConcept array<struct<system,code,display>> -> two parallel
    arrays: 'system|code' strings and display texts (F1)."""
    code_col = code_col or f"{col}{SEP}code"
    text_col = text_col or f"{col}{SEP}text"
    return (
        df.withColumn(
            code_col,
            F.transform(F.col(col), lambda x: F.concat_ws("|", x["system"], x["code"])),
        )
        .withColumn(text_col, F.transform(F.col(col), lambda x: x["display"]))
        .drop(col)
    )


def expand_coding(df: DataFrame, code_col: str, text_col: str, out_col: str) -> DataFrame:
    """Inverse of condense_coding (D2): rebuild the coding struct list."""
    return df.withColumn(
        out_col,
        F.transform(
            F.arrays_zip(
                F.col(f"`{code_col}`").alias("c"), F.col(f"`{text_col}`").alias("t")
            ),
            lambda x: F.struct(
                F.split(x["c"], "\\|").getItem(0).alias("system"),
                F.split(x["c"], "\\|").getItem(1).alias("code"),
                x["t"].alias("display"),
            ),
        ),
    ).drop(code_col, text_col)


def extensions_to_map(df: DataFrame, col: str, value_field: str = "value") -> DataFrame:
    """extension list [{url, value}] -> map keyed by url (F5); dotted
    columns per url are then one ``getItem`` away."""
    return df.withColumn(
        col,
        F.map_from_entries(
            F.transform(F.col(col), lambda x: F.struct(x["url"], x[value_field]))
        ),
    )
