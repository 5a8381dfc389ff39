"""SparkSession factory tuned for the encode engine.

Local mode stands in for a multi-executor cluster in this sandbox; every
knob below is chosen to behave identically on a 1000-executor cluster:
shuffle partition count tracks parallelism, AQE handles post-shuffle
coalescing and skew joins at runtime, and Arrow is the only
Python<->JVM transport (the kernels are ``mapInArrow`` batches).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# rows per Arrow batch handed to the encode kernel. Also the chunk
# granularity of the manifest — keep deterministic across runs.
# 16384 measured better than 8192 for both encode and decode (bigger
# zstd windows, fewer per-chunk overheads) at the same compression.
ARROW_BATCH_ROWS = 16384


def get_spark(
    app: str = "fhirflat_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        .config("spark.sql.parquet.compression.codec", "zstd")
        # lz4 (upstream default): measured faster than zstd for the
        # encode exchange (1M-row salted shuffle at local[8]: 4.0s lz4 vs
        # 4.5-5.4s zstd vs 3.5s uncompressed) — the shuffle payload is
        # re-compressed by the kernel anyway, so cheap-and-fast wins; on
        # tmpfs-backed local dirs callers can disable shuffle compression
        # outright (see bench.py)
        .config("spark.io.compression.codec", "lz4")
        # v2 commit: tasks move their files at task-commit; job commit is
        # O(1) instead of a serial per-partition rename storm on the driver
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or _default_shuffle(cores)))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _default_shuffle(cores: int | str) -> int:
    if isinstance(cores, str) and cores != "*":
        try:
            return max(int(cores), 4)
        except ValueError:
            pass
    if isinstance(cores, int):
        return max(cores, 4)
    return max(os.cpu_count() or 8, 8)
