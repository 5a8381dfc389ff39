"""Structured Streaming encode: continuous ingestion into the chunk store.

The reference is batch-only (SURVEY §2.8: no streaming anywhere); this is
an engine extension: a ``readStream`` source of code-table rows is encoded
micro-batch by micro-batch with the SAME kernels and manifest protocol —
``foreachBatch`` reuses ``encode_table`` per micro-batch into a
batch-id-namespaced partition range, so lineage/resume semantics carry
over unchanged (each micro-batch is recorded like a checkpointed run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def encode_stream(stream_df: DataFrame, out_dir: str, checkpoint_dir: str,
                  rows_per_bucket: int = 250_000, trigger_once: bool = True):
    """Attach the columnar encoder to a streaming DataFrame.

    Each micro-batch is encoded into ``{out_dir}/batch={id}`` with its own
    manifest — exactly-once via the streaming checkpoint: a replayed batch
    id overwrites its own directory idempotently (same determinism
    guarantees as the batch engine's golden manifest).
    """
    from fhirflat_spark.encode import encode_table

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        encode_table(
            batch_df,
            f"{out_dir}/batch={batch_id}",
            rows_per_bucket=rows_per_bucket,
        )

    writer = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer


def windowed_event_counts(stream_df: DataFrame, ts_col: str = "ts",
                          key_col: str = "event_type",
                          window: str = "1 minute",
                          watermark: str = "2 minutes") -> DataFrame:
    """Watermarked windowed aggregation (the standard late-data pattern) —
    demonstrates the streaming-native operator surface over `events`."""
    from pyspark.sql import functions as F

    # watermarks need session-tz TIMESTAMP; NTZ sources get a view cast
    return (
        stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), key_col)
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            key_col,
            "n",
            "sum_value",
        )
    )
