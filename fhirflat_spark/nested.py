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
  url (reference fhirflat/fhir2flat.py:202-267), ``map_from_entries``;
- ``map_to_extensions`` ~ D5: its inverse (reference ``create_extension``
  rebuild, flat2fhir.py:257-329), ``map_entries`` + ``transform``.
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
    """Inverse of flatten: rebuild nested structs from dotted names to any
    depth (the decode kernel shape D1 — reference ``expand_concepts``
    recursion, flat2fhir.py:387-462), in ONE select.

    Each dotted column is inserted into a name tree keyed by segment;
    the tree is rendered bottom-up as nested ``F.struct`` expressions over
    the original flat columns, so ``a.b.c``/``a.b.d``/``a.e`` become
    ``a: struct<b: struct<c, d>, e>`` (not ``struct<`b.c`, `b.d`, e>``).
    Output column order = order of first appearance, matching flatten's
    in-place expansion (flatten→unflatten is schema-identity, modulo
    nullability, for struct-only nesting). Note: rebuilt structs are
    non-nullable — a NULL struct round-trips as a struct of NULL fields,
    the same information the flat layer holds."""
    tree: dict[str, object] = {}
    for c in df.columns:
        parts = c.split(SEP)
        node = tree
        for p in parts[:-1]:
            nxt = node.setdefault(p, {})
            if isinstance(nxt, str):
                raise ValueError(
                    f"column {c!r} conflicts with flat column {p!r} — "
                    "cannot be both a struct and a scalar"
                )
            node = nxt
        if parts[-1] in node:
            raise ValueError(
                f"column {c!r} conflicts with struct group {parts[-1]!r}"
            )
        node[parts[-1]] = c  # leaf holds the full original column name

    def render(node) -> Column:
        if isinstance(node, str):
            return F.col(f"`{node}`")
        return F.struct(*[render(v).alias(k) for k, v in node.items()])

    return df.select(*[render(v).alias(k) for k, v in tree.items()])


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


def create_period(df: DataFrame, group: str) -> DataFrame:
    """Rebuild a Period-like struct from its flat dotted columns
    (``group.start``/``group.end`` → ``group: struct<start, end>``) —
    the generic single-group typed rebuild (reference ``expand_concepts``
    leaf case, flat2fhir.py:387-420)."""
    cols = [c for c in df.columns if c.startswith(group + SEP)]
    if not cols:
        return df
    fields = [F.col(f"`{c}`").alias(c.split(SEP, 1)[1]) for c in cols]
    return df.withColumn(group, F.struct(*fields)).drop(*cols)


def create_quantity(df: DataFrame, group: str) -> DataFrame:
    """Rebuild a Quantity struct (D3 — reference ``create_quantity``,
    flat2fhir.py:129-168): flat ``group.value``/``group.unit``/
    ``group.code`` become one struct; a fused ``system|code`` code column
    (no separate ``group.system`` present) is split back into its
    ``system`` and ``code`` fields."""
    cols = [c for c in df.columns if c.startswith(group + SEP)]
    if not cols:
        return df
    has_system = f"{group}{SEP}system" in df.columns
    fields: list[Column] = []
    for c in cols:
        attr = c.split(SEP, 1)[1]
        if attr == "code" and not has_system:
            code = F.col(f"`{c}`")
            fields.append(F.split(code, "\\|").getItem(0).alias("system"))
            fields.append(F.split(code, "\\|").getItem(1).alias("code"))
        else:
            fields.append(F.col(f"`{c}`").alias(attr))
    return df.withColumn(group, F.struct(*fields)).drop(*cols)


def create_codeable_concept(df: DataFrame, group: str) -> DataFrame:
    """Rebuild a codeableConcept coding list (D2/D4 — reference
    ``create_codeable_concept``, flat2fhir.py:42-126) from the condensed
    ``group.code`` (array of ``system|code``) + ``group.text`` columns."""
    return expand_coding(df, f"{group}{SEP}code", f"{group}{SEP}text", group)


# D6: the schema-registry dispatch (reference ``set_datatypes`` /
# ``expand_concepts`` type switch, flat2fhir.py:332-384) — a flat table +
# a column-prefix -> FHIR-type registry rebuilds every registered typed
# column in one plan (all builders are pure Column expressions).
TYPE_BUILDERS = {
    "Quantity": create_quantity,
    "CodeableConcept": create_codeable_concept,
    "Period": create_period,
    "struct": create_period,  # generic single-level struct rebuild
}


def set_datatypes(df: DataFrame, registry: dict[str, str]) -> DataFrame:
    """Typed rebuild of a heterogeneous flat table: for each
    ``column-prefix -> type`` entry dispatch the matching builder
    (unknown types raise — a registry typo should not silently pass)."""
    for group, ftype in registry.items():
        if ftype not in TYPE_BUILDERS:
            raise ValueError(f"no builder for type {ftype!r} (column {group!r})")
        df = TYPE_BUILDERS[ftype](df, group)
    return df


def map_to_extensions(df: DataFrame, col: str, value_field: str = "value") -> DataFrame:
    """Inverse of ``extensions_to_map`` (D5): map<url, value> -> extension
    list ``[{url, value}]`` (reference ``create_extension`` nested rebuild,
    flat2fhir.py:257-329). Entry order follows the map's stored order,
    which for ``map_from_entries`` output is insertion order — so
    extensions→map→extensions round-trips element order."""
    return df.withColumn(
        col,
        F.transform(
            F.map_entries(F.col(col)),
            lambda e: F.struct(e["key"].alias("url"), e["value"].alias(value_field)),
        ),
    )
