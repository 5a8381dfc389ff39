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


def merge_sessions(sorted_us, state_session, gap_us: int):
    """Gap-merge sorted event micros + the optional open-session interval
    from state into disjoint sessions (each separated by > gap_us).
    In-watermark late events preceding the open session by more than the
    gap form their own sessions rather than being absorbed."""
    sessions: list[tuple[int, int, int]] = []
    for t in sorted_us:
        if sessions and t - sessions[-1][1] <= gap_us:
            s, e, n = sessions[-1]
            sessions[-1] = (s, max(e, int(t)), n + 1)
        else:
            sessions.append((int(t), int(t), 1))
    if state_session is not None:
        merged: list[tuple[int, int, int]] = []
        for s0, e0, n0 in sorted(sessions + [tuple(state_session)]):
            if merged and s0 - merged[-1][1] <= gap_us:
                a, b, c = merged[-1]
                merged[-1] = (a, max(b, e0), c + n0)
            else:
                merged.append((s0, e0, n0))
        sessions = merged
    return sessions


def sessionize_stream(stream_df: DataFrame, gap_seconds: int = 1800,
                      ts_col: str = "ts", key_col: str = "user_id",
                      watermark: str = "2 hours") -> DataFrame:
    """Custom stateful streaming operator: per-key gap sessionization via
    ``applyInPandasWithState`` — the streaming form of the batch
    ``sessionize`` query (operators/relational.py), and the
    arbitrary-state surface SURVEY §2.8 calls for beyond windowed aggs.

    Per group and micro-batch: merge the batch's events with the open
    session carried in ``GroupState``, split on idle gaps > gap_seconds,
    EMIT every closed session, keep the last one open in state with an
    event-time timeout; on watermark-driven timeout the open session is
    flushed. Arrow-batched pandas per GROUP — no per-row Python.
    """
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        f"{key_col} BIGINT, session_start TIMESTAMP, session_end TIMESTAMP, "
        "n_events BIGINT, closed_by STRING"
    )
    state_schema = "start BIGINT, end BIGINT, n BIGINT"  # epoch micros
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs, state):
        k = key[0]
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    key_col: [k],
                    "session_start": [pd.Timestamp(start, unit="us")],
                    "session_end": [pd.Timestamp(end, unit="us")],
                    "n_events": [n],
                    "closed_by": ["timeout"],
                }
            )
            return
        ts = pd.concat([pdf[ts_col] for pdf in pdfs])
        us = (pd.to_datetime(ts).astype("int64") // 1000).sort_values()
        sessions = merge_sessions(
            us, tuple(state.get) if state.exists else None, gap_us
        )
        *closed, open_sess = sessions
        state.update(open_sess)
        state.setTimeoutTimestamp((open_sess[1] + gap_us) // 1000)
        if closed:
            yield pd.DataFrame(
                {
                    key_col: [k] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                    "closed_by": ["gap"] * len(closed),
                }
            )

    return (
        stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


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
