"""Sources/sinks (SURVEY §2.1 parity) + multi-table dataset bundles.

- S1 NDJSON source  -> ``read_ndjson`` (line-delimited JSON with explicit
  schema — never infer at scale);
- S4 CSV source     -> ``read_csv`` (header, explicit schema option);
- S6 parquet sink   -> plain ``df.write.parquet`` (nothing to wrap);
- S7 error sink     -> ``write_errors`` (quarantine channel, reference
  fhirflat/ingest.py:571-580);
- dataset bundle    -> ``encode_dataset``/``decode_dataset``: one encoded
  directory per table + a bundle-level summary with a checksum over the
  per-table dataset checksums — the ``fhirflat.toml`` + per-resource
  parquet bundle (reference fhirflat/ingest.py:397-432), generalized.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import DataFrame, SparkSession


def read_ndjson(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv(spark: SparkSession, path: str, schema=None) -> DataFrame:
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def write_errors(errors: DataFrame, path: str) -> None:
    """Quarantine sink for invalid/unmapped rows (S7)."""
    errors.write.mode("overwrite").option("header", "true").csv(path)


def encode_dataset(tables: dict[str, DataFrame], out_dir: str,
                   rows_per_bucket: int = 250_000, resume: bool = False) -> dict:
    """Encode a bundle of tables; one encoded dataset per table + a
    bundle summary whose checksum covers every table's dataset checksum."""
    from fhirflat_spark.encode import encode_table
    from fhirflat_spark.manifest import _local, read_summary

    results = {}
    h = hashlib.sha256()
    spark = None
    for name in sorted(tables):
        df = tables[name]
        spark = df.sparkSession
        res = encode_table(df, f"{out_dir}/{name}", rows_per_bucket=rows_per_bucket,
                           resume=resume)
        sha = read_summary(spark, f"{out_dir}/{name}")["dataset_sha256"]
        h.update(f"{name}:{sha}".encode())
        results[name] = {
            "rows": res.rows,
            "raw_bytes": res.raw_bytes,
            "encoded_bytes": res.encoded_bytes,
            "dataset_sha256": sha,
        }
    bundle = {
        "tables": results,
        "bundle_sha256": h.hexdigest(),
        "n_tables": len(results),
    }
    with open(_local(out_dir) + "/_BUNDLE.json", "w") as f:
        json.dump(bundle, f, indent=2)
    return bundle


def decode_dataset(spark: SparkSession, out_dir: str) -> dict[str, DataFrame]:
    from fhirflat_spark.decode import decode_table
    from fhirflat_spark.manifest import _local

    with open(_local(out_dir) + "/_BUNDLE.json") as f:
        bundle = json.load(f)
    return {name: decode_table(spark, f"{out_dir}/{name}") for name in bundle["tables"]}
