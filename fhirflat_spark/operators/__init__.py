"""Query/operator registry for the driver contract (__spark_entry__.py).

Each entry: name -> (callable(spark, sf_dir) -> DataFrame, oracle_sql|None).
Oracle SQL is ANSI SQL DuckDB runs on the same parquet tables; ops whose
semantics aren't SQL-expressible (arrow-kernel encode, multimodal stubs)
carry ``None`` and get the driver's weaker rows-only check.
"""

from __future__ import annotations

from fhirflat_spark.operators import (
    decontam,
    dedup,
    multimodal,
    packing,
    relational,
    sampling,
    similarity,
    storage,
    temporal,
    textops,
)

REGISTRY: dict[str, tuple] = {}
for mod in (relational, textops, dedup, similarity, multimodal, storage,
            temporal, sampling, packing, decontam):
    REGISTRY.update(mod.QUERIES)


def queries():
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracles():
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
