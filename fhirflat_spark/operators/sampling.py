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


def stable_hash32(key_col: str, seed: int | str) -> Column:
    """The raw 32-bit integer behind :func:`stable_uniform` — first 32
    bits of sha256("{key}:{seed}") as a long in [0, 2^32). Exposed so
    integer-threshold sampling (:func:`mix_domains`) can compare
    against exact integer cutoffs with no float division anywhere."""
    h = F.sha2(
        F.concat(F.col(key_col).cast("string"), F.lit(f":{seed}")), 256
    )
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def mixture_thresholds(
    counts: dict[str, int], weights: dict[str, int]
) -> dict[str, int]:
    """Exact integer hash cutoffs for a target domain mixture.

    Given per-domain row counts ``n_d`` and positive integer target
    weights ``w_d`` (the desired output proportions), the largest
    achievable output size without upsampling is
    ``M = min_d floor(n_d * W / w_d)`` with ``W = sum(w)`` — the
    domain that runs out first caps the mixture. Each domain then
    keeps rows whose 32-bit stable hash falls below
    ``t_d = floor(w_d * M * 2^32 / (W * n_d))``, i.e. an expected
    ``w_d * M / W`` rows. All arithmetic is unbounded Python int —
    exact at any table size — and the identical formula is
    SQL-expressible (DuckDB HUGEINT), so mixture membership is
    portable lineage exactly like :func:`stable_uniform` splits.

    Raises if a weighted domain has no rows (its proportion would be
    unachievable — an explicit signal beats an empty result)."""
    bad = {d: w for d, w in weights.items()
           if not isinstance(w, int) or isinstance(w, bool) or w <= 0}
    if bad:
        raise ValueError(f"weights must be positive ints, got {bad}")
    missing = sorted(d for d in weights if not counts.get(d))
    if missing:
        raise ValueError(
            f"weighted domain(s) {missing} have no rows; the requested "
            "mixture is unachievable without upsampling"
        )
    total_w = sum(weights.values())
    m = min(counts[d] * total_w // w for d, w in weights.items())
    return {
        d: (w * m << 32) // (total_w * counts[d])
        for d, w in weights.items()
    }


def mix_domains(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, int],
    key_col: str,
    seed: int | str = 0,
) -> DataFrame:
    """Resample a corpus to target domain proportions — the mixture
    step of a training-data pipeline (e.g. re-weighting web vs books
    vs code before tokenization). Downsampling only: the scarcest
    weighted domain is kept whole and every other domain is thinned to
    match, so expected output proportions equal ``weights``. Domains
    absent from ``weights`` are dropped (that IS the mixture).

    Execution shape at 100 TB: ONE map-side-combined count over the
    domain column (|domains| rows to the driver), thresholds computed
    exactly in Python int, then a pure per-row hash filter — a
    plan-time CASE chain inside whole-stage codegen with no join, no
    shuffle, no state. Determinism: membership is a pure function of
    (key, seed, the domain count multiset), identical on any engine —
    the DuckDB oracle recomputes count, cutoff, and hash per row.

    See also :func:`temperature_weights` for deriving ``weights`` from
    observed counts with a flattening exponent."""
    counts = {
        r[0]: r[1]
        for r in df.groupBy(domain_col).count().collect()
        if r[0] is not None
    }
    thresholds = mixture_thresholds(counts, weights)
    cutoff = F.lit(-1).cast("long")  # unweighted / NULL domains drop
    for value, t in sorted(thresholds.items()):
        cutoff = F.when(
            F.col(domain_col) == F.lit(value), F.lit(t).cast("long")
        ).otherwise(cutoff)
    return df.where(stable_hash32(key_col, seed) < cutoff)


def temperature_weights(
    counts: dict[str, int], alpha: float, scale: int = 1_000_000
) -> dict[str, int]:
    """Integer mixture weights ``w_d ∝ n_d^alpha`` — the standard
    temperature re-weighting (alpha=1 keeps natural proportions,
    alpha=0 is uniform, 0<alpha<1 flattens head domains and boosts the
    tail, the multilingual-corpus recipe). Floats touch only this
    driver-side weight derivation; the sampling itself stays exact
    integer arithmetic in :func:`mix_domains`."""
    if not counts:
        raise ValueError("counts is empty")
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    top = max(counts.values())
    return {
        d: max(1, round((n / top) ** alpha * scale))
        for d, n in counts.items()
        if n > 0
    }


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


def q_domain_mixture(spark, sf_dir):
    """Resample documents to a 1:2:2:1 en/fr/es/zh mixture (en is the
    head domain and gets thinned ~7x; fr is the scarcest weighted
    domain and survives whole; de is unweighted and dropped). The
    oracle recomputes domain counts, the exact integer cutoffs, and
    the per-row hash decision — so the feasibility bound M, the
    floor arithmetic, and hash membership are all pinned."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = mix_domains(
        docs, "lang", {"en": 1, "fr": 2, "es": 2, "zh": 1},
        key_col="doc_id", seed=13,
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
            F.sum("n_chars").alias("chars_sum"),
        )
        .orderBy("lang")
    )


SQL_DOMAIN_MIXTURE = """
WITH counts AS (
  SELECT lang, count(*) AS n FROM documents
  WHERE lang IS NOT NULL GROUP BY lang
),
w(lang, wt) AS (VALUES ('en', 1), ('fr', 2), ('es', 2), ('zh', 1)),
j AS (SELECT c.lang, c.n, w.wt FROM counts c JOIN w ON c.lang = w.lang),
m AS (SELECT min(n * 6 // wt) AS m FROM j),
thr AS (
  SELECT j.lang,
         (CAST(j.wt AS HUGEINT) * m.m * 4294967296) // (6 * j.n) AS t
  FROM j, m
),
kept AS (
  SELECT d.lang, d.doc_id, d.n_chars
  FROM documents d JOIN thr ON d.lang = thr.lang
  WHERE CAST(('0x' || substr(sha256(CAST(d.doc_id AS VARCHAR) || ':13'),
                             1, 8)) AS UBIGINT) < thr.t
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       CAST(sum(n_chars) AS BIGINT) AS chars_sum
FROM kept GROUP BY lang ORDER BY lang
"""


def shuffle_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: int | str = 0,
    with_position: bool = False,
) -> DataFrame:
    """Deterministic global training shuffle: assign every row a
    ``shard`` in [0, n_shards) and (optionally) a dense 0-based
    ``shard_pos`` giving a pseudo-random within-shard order — the
    "shuffle the corpus once, stream shards sequentially" export every
    training run starts from.

    Both decisions are pure functions of (key, seed), no randomness
    and no global sort: shard = stable 32-bit hash (salt ``:shard``)
    mod n_shards; order = an INDEPENDENT hash (salt ``:order``), ties
    broken by the key itself. Re-running on any cluster, any
    partitioning, reproduces the identical shuffle — and an engine
    reading the export can verify membership in SQL, like every other
    sampling decision in this module.

    Scale: shard assignment is a pure projection (codegen, no
    exchange). ``with_position=True`` adds ROW_NUMBER over
    (shard, order-hash) — ONE hash exchange on ``shard``; with
    n_shards >= cluster parallelism and a uniform hash, skew is
    bounded by hash uniformity, never by data order. NULL keys get
    NULL shard/position (document keys, not row positions) — filter
    them first if the corpus allows them.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    shard = (stable_hash32(key_col, f"{seed}:shard")
             % F.lit(int(n_shards))).cast("int")
    out = df.withColumn("shard", shard)
    if not with_position:
        return out
    from pyspark.sql import Window

    okey = stable_hash32(key_col, f"{seed}:order")
    w = (Window.partitionBy("shard")
         .orderBy(okey.asc(), F.col(key_col).asc()))
    pos = (F.row_number().over(w) - F.lit(1)).cast("long")
    return out.withColumn(
        "shard_pos",
        F.when(F.col(key_col).isNull(), F.lit(None).cast("long"))
        .otherwise(pos),
    )


def q_training_shards(spark, sf_dir):
    """The full shard assignment — every document's (shard, shard_pos)
    hash-compared row-for-row against the SQL twin recomputing both
    hashes, the modulus, and the window. A single misplaced row (wrong
    salt, wrong tie-break, 1-based position) shifts every position
    behind it and fails the hash."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return shuffle_shards(
        docs, "doc_id", 16, seed=5, with_position=True
    ).select("doc_id", "shard", "shard_pos")


SQL_TRAINING_SHARDS = """
SELECT doc_id,
       CAST(CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)
                                        || ':5:shard'), 1, 8))
                 AS UBIGINT) % 16 AS INTEGER) AS shard,
       CAST(ROW_NUMBER() OVER (
            PARTITION BY CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)
                                              || ':5:shard'), 1, 8))
                              AS UBIGINT) % 16
            ORDER BY CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)
                                          || ':5:order'), 1, 8))
                          AS UBIGINT) ASC, doc_id ASC
       ) - 1 AS BIGINT) AS shard_pos
FROM documents
"""


QUERIES = {
    "stable_sample": (q_stable_sample, SQL_STABLE_SAMPLE),
    "stratified_split": (q_stratified_split, SQL_STRATIFIED_SPLIT),
    "domain_mixture": (q_domain_mixture, SQL_DOMAIN_MIXTURE),
    "training_shards": (q_training_shards, SQL_TRAINING_SHARDS),
}
