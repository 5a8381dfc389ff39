"""Deterministic content-hash sampling — the stable train/holdout
splits and mixture sampling a training-data pipeline needs.

``rand()``-based sampling is useless for corpus curation: re-running the
job, adding an executor, or repartitioning changes the sample. Here the
inclusion decision is a pure function of (key, seed): a sha256-derived
uniform in [0, 1) compared against the fraction. Properties that matter
at 100 TB:

- **Reproducible anywhere.** The same (key, seed) lands in the same
  split on any cluster, any partitioning, any engine — the oracle
  recomputes the identical decision in SQL.
- **Consistent across tables.** Sampling two tables by the same join
  key keeps them aligned (both sides of a pair survive together).
- **No coordination.** Pure per-row projection inside whole-stage
  codegen: no shuffle, no state, no driver involvement — a filter
  pushed to wherever the row lives.

sha256 (not xxhash/murmur) is deliberate: every engine agrees on it
bit-for-bit, so split membership is portable lineage, not an engine
artifact. The 8-hex-digit (32-bit) resolution bounds the fraction
granularity at ~2.3e-10 — far below any real split ratio. NULL keys
hash to NULL and are never sampled (document keys, not row positions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TWO32 = float(1 << 32)


def stable_uniform(key_col: str, seed: int | str) -> Column:
    """A [0, 1) uniform that is a pure function of (key, seed):
    first 32 bits of sha256("{key}:{seed}") / 2^32. Identical in any
    engine with sha256 — the DuckDB oracle recomputes it exactly."""
    h = F.sha2(
        F.concat(F.col(key_col).cast("string"), F.lit(f":{seed}")), 256
    )
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") / F.lit(_TWO32)
    )


def sample_hash(
    df: DataFrame, key_col: str, fraction: float, seed: int | str = 0
) -> DataFrame:
    """Keep each row iff its stable uniform < ``fraction`` — the
    deterministic Bernoulli sample (per distinct key, so duplicate keys
    survive or drop together)."""
    return df.where(stable_uniform(key_col, seed) < F.lit(float(fraction)))


def split_column(
    key_col: str,
    holdout_frac: float,
    seed: int | str = 0,
    labels: tuple[str, str] = ("train", "holdout"),
) -> Column:
    """A split-label column: ``holdout`` for the lowest
    ``holdout_frac`` of the hash space, ``train`` for the rest. Keys
    keep their split under any re-run or re-partitioning; growing the
    holdout fraction only MOVES train keys into holdout, never the
    reverse (nested splits — the property audits rely on)."""
    u = stable_uniform(key_col, seed)
    return F.when(
        u < F.lit(float(holdout_frac)), F.lit(labels[1])
    ).otherwise(F.lit(labels[0]))


def sample_stratified(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int | str = 0,
) -> DataFrame:
    """Per-stratum sampling rates (corpus mixture weights): each
    stratum keeps its own deterministic fraction; strata absent from
    ``fractions`` keep ``default_fraction``. The rate expression is a
    plan-time CASE chain over the (small) strata map — no join, no
    shuffle, stays in codegen."""
    rate = F.lit(float(default_fraction))
    for value, frac in sorted(fractions.items()):
        rate = F.when(
            F.col(strata_col) == F.lit(value), F.lit(float(frac))
        ).otherwise(rate)
    return df.where(stable_uniform(key_col, seed) < rate)


# ---------------------------------------------------------------- queries


def q_stable_sample(spark, sf_dir):
    """10% deterministic sample of documents by doc_id (seed 42) — the
    oracle recomputes the sha-derived inclusion decision row by row, so
    ANY divergence in the hash-space mapping (wrong substring, wrong
    radix, an engine-specific hash) changes membership and fails."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        sample_hash(docs, "doc_id", 0.1, seed=42)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


SQL_STABLE_SAMPLE = """
SELECT doc_id, lang, n_chars FROM documents
WHERE CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR) || ':42'), 1, 8))
           AS UBIGINT) / 4294967296.0 < 0.1
ORDER BY doc_id
"""


def q_stratified_split(spark, sf_dir):
    """Mixture weights + train/holdout in one pass: per-language
    sampling rates (en 0.9, fr 0.5, others 0.2), then a 25% holdout
    split over the survivors with an independent seed; the per-(lang,
    split) counts and char totals pin both decisions."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = sample_stratified(
        docs, "doc_id", "lang",
        {"en": 0.9, "fr": 0.5}, default_fraction=0.2, seed=7,
    )
    return (
        kept.withColumn("split", split_column("doc_id", 0.25, seed="s2"))
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("chars_sum"),
        )
        .orderBy("lang", "split")
    )


SQL_STRATIFIED_SPLIT = """
WITH kept AS (
  SELECT * FROM documents
  WHERE CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR) || ':7'), 1, 8))
             AS UBIGINT) / 4294967296.0
        < CASE lang WHEN 'en' THEN 0.9 WHEN 'fr' THEN 0.5 ELSE 0.2 END
)
SELECT lang,
       CASE WHEN CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)
                                             || ':s2'), 1, 8))
                      AS UBIGINT) / 4294967296.0 < 0.25
            THEN 'holdout' ELSE 'train' END AS split,
       count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars_sum
FROM kept GROUP BY 1, 2 ORDER BY lang, split
"""


QUERIES = {
    "stable_sample": (q_stable_sample, SQL_STABLE_SAMPLE),
    "stratified_split": (q_stratified_split, SQL_STRATIFIED_SPLIT),
}
