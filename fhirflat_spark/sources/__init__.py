"""Sources/sinks (SURVEY §2.1 parity) + multi-table dataset bundles.

- S1 NDJSON source  -> ``read_ndjson`` (line-delimited JSON with explicit
  schema — never infer at scale);
- S4 CSV source     -> ``read_csv`` (header, explicit schema option);
- S5 URL CSV source -> ``read_url_csv``/``sheet_url`` (the reference's
  Google-Sheets mapping fetch, fhirflat/ingest.py:497-507: a driver-side
  metadata download, never a data-plane read — sheet-sized tables are
  broadcast-joined against the data);
- S6 parquet sink   -> plain ``df.write.parquet`` (nothing to wrap);
- S7 error sink     -> ``write_errors`` (quarantine channel, reference
  fhirflat/ingest.py:571-580);
- S9 archive sink   -> ``archive_output``/``unarchive_input`` (the
  reference's zip/tar export of the output folder, ingest.py:599-601 —
  a driver-side packaging step for hand-off, distinct from the archive
  *compression profile* which is the at-scale storage answer);
- dataset bundle    -> ``encode_dataset``/``decode_dataset``: one encoded
  directory per table + a bundle-level summary with a checksum over the
  per-table dataset checksums — the ``fhirflat.toml`` + per-resource
  parquet bundle (reference fhirflat/ingest.py:397-432), generalized.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile
import urllib.request

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


def sheet_url(sheet_id: str, gid: int | None = None) -> str:
    """The reference's Google-Sheets CSV export URL
    (fhirflat/ingest.py:497-507)."""
    url = f"https://docs.google.com/spreadsheets/d/{sheet_id}/export?format=csv"
    return url if gid is None else f"{url}&gid={gid}"


def read_url_csv(spark: SparkSession, url: str, schema=None) -> DataFrame:
    """S5: fetch a CSV over a URL (http/https/file) on the DRIVER and load
    it as a DataFrame. This is mapping-table-sized metadata (the reference
    reads its Google-Sheets mapping rules this way) — it is deliberately a
    driver-side download + local read, never a distributed fetch: the
    result is then broadcast-joined against the data plane
    (``ingest.apply_mapping``). Retries are the caller's policy; errors
    surface as the urllib exception."""
    with urllib.request.urlopen(url) as resp:  # noqa: S310 (caller's URL)
        body = resp.read()
    tmp = tempfile.NamedTemporaryFile(
        suffix=".csv", delete=False, prefix="fhirflat_spark_url_"
    )
    try:
        tmp.write(body)
        tmp.close()
        # eager materialization so the temp file can be removed
        df = read_csv(spark, f"file://{tmp.name}", schema=schema)
        rows = df.collect()
        return spark.createDataFrame(rows, df.schema)
    finally:
        os.unlink(tmp.name)


def archive_output(out_dir: str, fmt: str = "zip",
                   remove_source: bool = False) -> str:
    """S9: package an output directory as a single archive file
    (reference ``shutil.make_archive`` + optional source removal,
    fhirflat/ingest.py:599-601). A hand-off/export convenience for
    SMALL outputs — at 100 TB the storage answer is the archive
    *compression profile* + transcode compaction, not a tarball."""
    path = shutil.make_archive(out_dir, fmt, out_dir)
    if remove_source:
        shutil.rmtree(out_dir)
    return path


def unarchive_input(archive_path: str, dest_dir: str) -> str:
    """Inverse of ``archive_output`` (reference validate() accepts
    compressed folders)."""
    shutil.unpack_archive(archive_path, dest_dir)
    return dest_dir


def encode_dataset(tables: dict[str, DataFrame], out_dir: str,
                   rows_per_bucket: int = 250_000, resume: bool = False) -> dict:
    """Encode a bundle of tables; one encoded dataset per table + a
    bundle summary whose checksum covers every table's dataset checksum."""
    from fhirflat_spark import fsio
    from fhirflat_spark.encode import encode_table
    from fhirflat_spark.manifest import read_summary

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
    fsio.write_bytes_atomic(f"{out_dir}/_BUNDLE.json",
                            json.dumps(bundle, indent=2).encode())
    return bundle


def decode_dataset(spark: SparkSession, out_dir: str) -> dict[str, DataFrame]:
    from fhirflat_spark import fsio
    from fhirflat_spark.decode import decode_table

    bundle = json.loads(fsio.read_bytes(f"{out_dir}/_BUNDLE.json"))
    return {name: decode_table(spark, f"{out_dir}/{name}") for name in bundle["tables"]}
