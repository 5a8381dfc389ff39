"""Sequence packing — assembling documents into fixed-budget context
windows (training-batch assembly). Deterministic contiguous fill: order
the corpus by a stable key, run a token prefix sum, and cut bins every
``budget`` tokens (a document straddling a boundary starts its bin at
its first token's position — bins overflow by at most one document,
never split one). With the order key a [[stable_uniform]] hash the fill
order is a reproducible global shuffle, which is how real pipelines
randomize packing without losing determinism.

The prefix sum is the distributed two-phase formulation, NOT a global
window (`Window.orderBy` without partitionBy collapses the table into
ONE task — the classic Spark scale trap): range-partition by the order
key, per-partition running sums inside each sorted partition, then add
per-partition offsets computed from the #partitions-sized totals list
(metadata-sized driver hop, same budget class as the encode planner's
key stats). Cost = one range exchange + one in-partition window —
the same shape as any global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def prefix_sum(
    df: DataFrame, order_col: str, val_col: str, out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Inclusive running sum of ``val_col`` in global ``order_col``
    order, scalable: range exchange + local window + broadcast
    per-partition offsets (never a single-task global window)."""
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, order_col).sortWithinPartitions(
        order_col
    ).withColumn("__pid", F.spark_partition_id())
    w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("__local", F.sum(val_col).over(w))
    # per-partition totals: #partitions rows — metadata-sized by design
    totals = {
        r["__pid"]: r["t"]
        for r in local.groupBy("__pid").agg(
            F.max("__local").alias("t")
        ).collect()
    }
    offset, offsets = 0, {}
    for pid in sorted(totals):
        offsets[pid] = offset
        offset += totals[pid]
    off_expr = F.lit(0).cast("long")
    for pid, off in offsets.items():
        if off:
            off_expr = F.when(
                F.col("__pid") == pid, F.lit(off)
            ).otherwise(off_expr)
    return local.withColumn(
        out_col, (F.col("__local") + off_expr).cast("long")
    ).drop("__pid", "__local")


def pack_documents(
    df: DataFrame,
    key_col: str,
    token_col: str,
    budget: int,
    shuffle_seed: int | str | None = None,
) -> DataFrame:
    """Assign each document a ``bin_id``: contiguous fill in ``key_col``
    order (or in deterministic hash-shuffled order when
    ``shuffle_seed`` is set), cutting a new bin every ``budget`` tokens.
    bin_id = (cum - tokens) div budget — the bin a document's FIRST
    token lands in, so every document belongs to exactly one bin."""
    work = df
    order_col = key_col
    if shuffle_seed is not None:
        from fhirflat_spark.operators.sampling import stable_uniform

        work = work.withColumn(
            "__ord", stable_uniform(key_col, shuffle_seed)
        )
        order_col = "__ord"
    cum = prefix_sum(work, order_col, token_col, out_col="__cum")
    return cum.withColumn(
        "bin_id",
        F.expr(f"(__cum - {token_col}) div {budget}").cast("long"),
    ).drop("__cum", "__ord")


# ---------------------------------------------------------------- queries

_BUDGET = 16384


def q_pack_bins(spark, sf_dir):
    """Pack documents into 16384-char context bins in doc_id order and
    report each bin's document count and fill — the oracle recuts the
    bins from a SQL window prefix sum, so an off-by-one at a bin
    boundary, a straddling document double-counted, or a broken
    distributed prefix sum (wrong partition offsets) shifts every
    downstream bin and fails the hash."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    packed = pack_documents(docs, "doc_id", "n_chars", _BUDGET)
    return (
        packed.groupBy("bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("chars_sum"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("bin_id")
    )


SQL_PACK_BINS = f"""
WITH c AS (
  SELECT doc_id, n_chars,
         sum(n_chars) OVER (ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
  FROM documents
)
SELECT CAST((cum - n_chars) // {_BUDGET} AS BIGINT) AS bin_id,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS chars_sum,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM c GROUP BY 1 ORDER BY bin_id
"""


# --- sliding-window chunking: the complement of packing — packing
#     assembles SHORT documents into full context windows, chunking
#     splits LONG documents into overlapping windows (stride < window =
#     token overlap so no boundary context is lost). Pure per-row
#     projection (split → sequence → posexplode → slice), zero shuffle,
#     zero Python — the cheapest possible plan shape; at 100 TB it
#     pipelines inside the scan stage.


def chunk_documents(
    df: DataFrame, text_col: str, window: int, stride: int
) -> DataFrame:
    """Split each document's whitespace tokens into sliding windows of
    ``window`` tokens every ``stride`` tokens. Chunk count =
    1 + ceil(max(n - window, 0) / stride): the last window always covers
    the tail, a doc with n <= window yields exactly one chunk, and an
    interior chunk overlaps its predecessor by window - stride tokens.
    Output: input columns + (chunk_id, chunk_tokens, chunk_text)."""
    if not 0 < stride <= window:
        raise ValueError(f"need 0 < stride ({stride}) <= window ({window})")
    arr = F.split(F.lower(F.trim(text_col)), r"\s+")
    n = F.size(arr)
    n_chunks = F.lit(1) + F.floor(
        (F.greatest(n - F.lit(window), F.lit(0)) + F.lit(stride - 1))
        / F.lit(stride)
    ).cast("int")
    exploded = df.select(
        "*",
        F.posexplode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias(
            "chunk_id", "__start"
        ),
    )
    tokens = F.slice(
        F.split(F.lower(F.trim(text_col)), r"\s+"),
        F.col("__start") * stride + 1,
        window,
    )
    return (
        exploded.withColumn("chunk_text", F.concat_ws(" ", tokens))
        .withColumn("chunk_tokens", F.size(tokens))
        .drop("__start")
    )


_WINDOW, _STRIDE = 16, 12


def q_chunk_windows(spark, sf_dir):
    """Every sliding-window chunk of every document, pinned by content
    sha — an off-by-one in window starts, a lost tail, or a wrong
    overlap changes some chunk's text and fails the hash."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        chunk_documents(docs, "text", _WINDOW, _STRIDE)
        .select(
            "doc_id",
            "chunk_id",
            "chunk_tokens",
            F.sha2("chunk_text", 256).alias("chunk_sha"),
        )
        .orderBy("doc_id", "chunk_id")
    )


SQL_CHUNK_WINDOWS = rf"""
WITH arrs AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS arr
  FROM documents
),
counts AS (
  SELECT doc_id, arr,
         1 + (greatest(len(arr) - {_WINDOW}, 0) + {_STRIDE - 1})
             // {_STRIDE} AS n_chunks
  FROM arrs
)
SELECT doc_id, CAST(i AS INT) AS chunk_id,
       CAST(len(arr[i * {_STRIDE} + 1 : i * {_STRIDE} + {_WINDOW}]) AS INT)
           AS chunk_tokens,
       sha256(array_to_string(
           arr[i * {_STRIDE} + 1 : i * {_STRIDE} + {_WINDOW}], ' '))
           AS chunk_sha
FROM counts, LATERAL unnest(range(n_chunks)) AS t(i)
ORDER BY doc_id, chunk_id
"""


QUERIES = {
    "pack_context_bins": (q_pack_bins, SQL_PACK_BINS),
    "chunk_windows": (q_chunk_windows, SQL_CHUNK_WINDOWS),
}
