"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship end-to-end run of the encode engine on
  sf0.001 — encode the ``documents`` table (columnar lightweight
  compression with codec auto-selection), verify every chunk round-trips
  bit-identically, and return the per-column codec report.
- ``queries()`` / ``oracle_sql()``: one entry per implemented operator
  from SURVEY.md §2 + the training-data ops, each DuckDB-cross-checkable.
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the engine importable regardless of the harness's cwd (and for
# python workers spawned by executors)
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
os.environ["PYTHONPATH"] = (
    _REPO_ROOT + os.pathsep + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: encode → verify → codec report on sf0.001 documents."""
    from pyspark.sql import functions as F

    from fhirflat_spark.decode import codec_report, verify_table
    from fhirflat_spark.encode import encode_table

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # store the content fingerprint alongside the row — the dedup key
    # (dedup_exact / dedup_keep_list group on sha2(text)) a curation
    # pipeline keeps materialized. High-entropy hex is also the corpus
    # class where the fsst tile coder beats zstd in the codec race
    # (complete pair coverage: ratio ~0.50 vs zstd ~0.52), so the codec
    # report exercises every string-codec family the selector knows.
    docs = docs.withColumn("content_sha", F.sha2(F.col("text"), 256))
    # one partition: sf0.001 is 500 rows — the keyless planner's
    # default-parallelism floor would split it into 8 KB chunks whose
    # fixed codec overheads (fsst's 512 B symbol table) distort the
    # codec race that production-size chunks (100 KB+) see
    out = tempfile.mkdtemp(prefix="fhirflat_spark_entry_") + "/ds"
    res = encode_table(docs, out, rows_per_bucket=2000, num_partitions=1)
    verified = verify_table(spark, out)
    n_bad = verified.where(~F.col("ok")).count()
    report = codec_report(spark, out)
    return report.withColumn("rows_total", F.lit(res.rows)).withColumn(
        "chunks_failed_verification", F.lit(n_bad)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from fhirflat_spark.operators import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from fhirflat_spark.operators import oracles

    return oracles()
