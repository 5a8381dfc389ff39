"""Eval-set decontamination — n-gram overlap between the training corpus
and a held-out benchmark slice, the step every LLM training pipeline runs
before the data ships (strip documents that would leak eval answers).

No reference analog (globaldothealth/fhirflat is a FHIR ingest tool); this
covers the driver brief's training-data-pipeline mandate alongside the
dedup/similarity suite.

Scale shape (100 TB discipline):

- Shingling is a pure per-row projection (``split`` -> ``transform`` ->
  ``concat_ws`` over Catalyst higher-order functions) — stays inside
  whole-stage codegen, no Python, no shuffle.
- Shingles join on a PORTABLE 60-bit hash (sha256-prefix, the same family
  the minhash oracles verify numerically) — fixed-width join keys instead
  of full n-gram strings, so shuffle volume is 8 bytes/shingle not the
  text itself.
- The eval side of the join is tiny at any real scale (benchmarks are
  thousands of documents against a 10^12-file corpus), so it is
  explicitly ``broadcast()`` — the contamination scan is then ONE pass
  over the corpus with a map-side hash-set probe and a single groupBy
  shuffle on doc_id (partial count agg).
- Ubiquitous shingles (stopword runs) would make every document "hit";
  production decontamination caps eval-shingle document frequency the
  same way the jaccard pipeline caps MAX_DF. Here the eval slice is
  small enough that distinct() suffices; the df-cap seam is
  ``_eval_shingles``.

Determinism: the eval slice is ``doc_id % EVAL_MOD == 0`` — a pure
function of the key, identical in the DuckDB oracle, so membership is
lineage, not an engine artifact (same rationale as sampling.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fhirflat_spark.operators.dedup import _spark_hash64, _sql_hash64
from fhirflat_spark.operators.relational import load

NGRAM = 2  # word-bigram shingles (synthetic corpus is short word soup;
#            real pipelines use 8-13-gram — a parameter, not a design change)
EVAL_MOD = 50  # every 50th doc_id plays the held-out benchmark
RATIO_FLAG = 0.5  # contaminated iff >= half of a doc's shingles hit eval


def shingle_hashes(docs: DataFrame, n: int = NGRAM) -> DataFrame:
    """(doc_id, sh_hash) — distinct hashed word n-grams per document.

    Short documents (< n words) yield zero shingles: the guard matters
    because Spark's ``sequence(0, size-n)`` runs DESCENDING when the stop
    is negative (it would fabricate shingles for 1-word docs).
    """
    arr = F.split(F.lower(F.trim("text")), r"\s+")
    idx = F.sequence(F.lit(0), F.size(arr) - F.lit(n))
    grams = F.when(
        F.size(arr) >= n,
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(arr, i + 1, n)))
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        "doc_id", F.explode(grams).alias("sh")
    ).select("doc_id", _spark_hash64(F.col("sh")).alias("sh_hash"))


def _sql_shingles(pred: str, n: int = NGRAM) -> str:
    """DuckDB mirror of shingle_hashes over ``documents`` rows where pred."""
    return rf"""
  SELECT DISTINCT doc_id, {_sql_hash64("sh")} AS sh_hash
  FROM (
    SELECT doc_id, array_to_string(arr[i + 1 : i + {n}], ' ') AS sh
    FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS arr
          FROM documents WHERE {pred}),
         LATERAL unnest(range(len(arr) - {n - 1})) AS t(i)
  )
"""


def _eval_shingles(docs: DataFrame, n: int = NGRAM) -> DataFrame:
    """Distinct shingle hashes of the benchmark slice — the broadcast side."""
    return (
        shingle_hashes(docs.where(F.col("doc_id") % EVAL_MOD == 0), n)
        .select("sh_hash")
        .distinct()
    )


def contamination(docs: DataFrame, n: int = NGRAM) -> DataFrame:
    """Per-training-doc overlap stats vs the eval slice: (doc_id,
    n_shingles, n_hits, hit_ratio, contaminated). One broadcast probe +
    one groupBy(doc_id) shuffle."""
    train = shingle_hashes(docs.where(F.col("doc_id") % EVAL_MOD != 0), n)
    ev = F.broadcast(_eval_shingles(docs, n).withColumn("hit", F.lit(1)))
    return (
        train.join(ev, "sh_hash", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"),
        )
        .withColumn(
            "hit_ratio",
            F.round(F.col("n_hits") / F.col("n_shingles"), 6),
        )
        .withColumn("contaminated", F.col("hit_ratio") >= RATIO_FLAG)
    )


def decontaminate(docs: DataFrame, n: int = NGRAM) -> DataFrame:
    """The corpus with contaminated training docs removed (eval slice rows
    are not training data and are dropped too) — the shippable output."""
    bad = contamination(docs, n).where("contaminated").select("doc_id")
    return (
        docs.where(F.col("doc_id") % EVAL_MOD != 0)
        .join(F.broadcast(bad), "doc_id", "left_anti")
    )


_SQL_CONTAMINATION = f"""
WITH train AS ({_sql_shingles(f"doc_id % {EVAL_MOD} <> 0")}),
eval_sh AS (SELECT DISTINCT sh_hash
            FROM ({_sql_shingles(f"doc_id % {EVAL_MOD} = 0")})),
stats AS (
  SELECT t.doc_id,
         count(*) AS n_shingles,
         CAST(sum(CASE WHEN e.sh_hash IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_hits
  FROM train t LEFT JOIN eval_sh e USING (sh_hash)
  GROUP BY t.doc_id
)
SELECT doc_id, n_shingles, n_hits,
       round(n_hits * 1.0 / n_shingles, 6) AS hit_ratio,
       (n_hits * 1.0 / n_shingles) >= {RATIO_FLAG} AS contaminated
FROM stats
"""


def q_decontam_overlap(spark, sf_dir):
    """Docs with any eval overlap, worst first — non-empty and
    discriminating at every testdata sf (bigrams over the word-soup corpus
    give a spread of ratios, not an all-or-nothing)."""
    return (
        contamination(load(spark, sf_dir, "documents"))
        .where(F.col("n_hits") > 0)
        .orderBy(F.desc("hit_ratio"), "doc_id")
    )


SQL_DECONTAM_OVERLAP = f"""
{_SQL_CONTAMINATION.rstrip()}
  WHERE n_hits > 0
ORDER BY hit_ratio DESC, doc_id
"""


def q_decontam_clean_stats(spark, sf_dir):
    """Per-lang survivor counts + char mass after decontamination — pins
    the REMOVAL (the join-back + anti-join), not just the detection."""
    return (
        decontaminate(load(spark, sf_dir, "documents"))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("chars_sum"),
        )
        .orderBy("lang")
    )


SQL_DECONTAM_CLEAN_STATS = f"""
WITH contam AS ({_SQL_CONTAMINATION.rstrip()})
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars_sum
FROM documents d
WHERE d.doc_id % {EVAL_MOD} <> 0
  AND NOT EXISTS (SELECT 1 FROM contam c
                  WHERE c.doc_id = d.doc_id AND c.contaminated)
GROUP BY lang ORDER BY lang
"""


QUERIES = {
    "decontam_overlap": (q_decontam_overlap, SQL_DECONTAM_OVERLAP),
    "decontam_clean_stats": (q_decontam_clean_stats, SQL_DECONTAM_CLEAN_STATS),
}
