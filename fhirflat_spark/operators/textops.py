"""Text-analysis operators for a training-data pipeline, over `documents`.

All JVM-side Catalyst expressions (regexp_count, sha2, split) — no Python
in the row path; each has an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fhirflat_spark.operators.relational import load


# --- shared scalar expressions (one definition; quality_score /
# fingerprint / token_count AND the composed curation pipeline all use
# these, so the component operators cannot drift from the pipeline)

def _ws_tokens_expr():
    return F.when(F.length(F.trim("text")) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim("text"), "\\s+"))
    )


def _quality_expr():
    length = F.length("text")
    stop = F.regexp_count(F.lower(F.col("text")), F.lit(r"\b(the|and|of|to|in|a|is)\b"))
    words = F.regexp_count(F.col("text"), F.lit(r"[A-Za-z]+"))
    return F.round(
        (stop / F.greatest(words, F.lit(1)) * 0.5)
        + F.least(length / F.lit(500.0), F.lit(1.0)) * 0.5,
        6,
    )


def _norm_expr():
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9\s]", ""),
            r"\s+",
            " ",
        )
    )


_SQL_WS_TOKENS = (
    r"CASE WHEN length(trim(text)) = 0 THEN 0"
    r" ELSE len(string_split_regex(trim(text), '\s+')) END"
)
_SQL_QUALITY = (
    r"round(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|a|is)\b'))"
    r" / greatest(len(regexp_extract_all(text, '[A-Za-z]+')), 1) * 0.5"
    r" + least(length(text) / 500.0, 1.0) * 0.5, 6)"
)
_SQL_NORM = (
    r"trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),"
    r" '\s+', ' ', 'g'))"
)

# --- token counting (whitespace + a BPE-ish word/punct regex)

def q_token_count(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            _ws_tokens_expr().alias("ws_tokens"),
            F.regexp_count(F.col("text"), F.lit(r"[A-Za-z0-9]+|[^\sA-Za-z0-9]")).alias("bpeish_tokens"),
        )
        .orderBy("doc_id")
    )


SQL_TOKEN_COUNT = rf"""
SELECT doc_id,
       {_SQL_WS_TOKENS} AS ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z0-9]+|[^\sA-Za-z0-9]')) AS bpeish_tokens
FROM documents ORDER BY doc_id
"""


# --- quality scoring: length / punctuation / stopword / uppercase ratios

def q_quality_score(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    length = F.length("text")
    punct = F.regexp_count(F.col("text"), F.lit(r"[.,!?;:]"))
    stop = F.regexp_count(F.lower(F.col("text")), F.lit(r"\b(the|and|of|to|in|a|is)\b"))
    words = F.regexp_count(F.col("text"), F.lit(r"[A-Za-z]+"))
    return (
        docs.select(
            "doc_id",
            length.alias("n_chars_measured"),
            F.round(punct / F.greatest(length, F.lit(1)), 6).alias("punct_ratio"),
            F.round(stop / F.greatest(words, F.lit(1)), 6).alias("stopword_ratio"),
            _quality_expr().alias("quality"),
        )
        .orderBy("doc_id")
    )


SQL_QUALITY_SCORE = rf"""
SELECT doc_id,
       length(text) AS n_chars_measured,
       round(len(regexp_extract_all(text, '[.,!?;:]'))
             / greatest(length(text), 1), 6) AS punct_ratio,
       round(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|a|is)\b'))
             / greatest(len(regexp_extract_all(text, '[A-Za-z]+')), 1), 6) AS stopword_ratio,
       {_SQL_QUALITY} AS quality
FROM documents ORDER BY doc_id
"""


# --- n-gram-heuristic language id: marker-word votes per language

_MARKERS = {
    "en": r"\b(the|and|of|is|was)\b",
    "de": r"\b(der|die|das|und|ist)\b",
    "fr": r"\b(le|la|les|et|est)\b",
    "es": r"\b(el|los|las|es|y)\b",
}


def q_lang_id(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    scores = [
        F.regexp_count(F.lower(F.col("text")), F.lit(pat)).alias(f"score_{lang}")
        for lang, pat in _MARKERS.items()
    ]
    scored = docs.select("doc_id", "lang", *scores)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in _MARKERS])
    pred = F.lit("other")
    # ties broken by iteration order: first language reaching the max wins
    for lang in reversed(list(_MARKERS)):
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return (
        scored.withColumn("predicted", pred)
        .select("doc_id", "lang", "predicted", *[f"score_{lang}" for lang in _MARKERS])
        .orderBy("doc_id")
    )


def _sql_lang_id() -> str:
    score_exprs = ",\n       ".join(
        f"len(regexp_extract_all(lower(text), '{pat}')) AS score_{lang}"
        for lang, pat in _MARKERS.items()
    )
    langs = list(_MARKERS)
    best = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    case = "CASE "
    for lang in langs:  # first max wins — mirror the Spark when-chain
        case += f"WHEN score_{lang} = {best} AND {best} > 0 THEN '{lang}' "
    case += "ELSE 'other' END"
    cols = ", ".join(f"score_{lang}" for lang in langs)
    return f"""
WITH scored AS (
  SELECT doc_id, lang,
       {score_exprs}
  FROM documents
)
SELECT doc_id, lang, {case} AS predicted, {cols}
FROM scored ORDER BY doc_id
"""


# --- document fingerprinting: sha256 over normalized text
#     (rolling-hash-style canonicalization: lower, strip punct, collapse ws)

def q_fingerprint(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    norm = _norm_expr()
    return (
        docs.select("doc_id", F.sha2(norm, 256).alias("fingerprint"))
        .orderBy("doc_id")
    )


SQL_FINGERPRINT = rf"""
SELECT doc_id,
       sha256({_SQL_NORM}) AS fingerprint
FROM documents ORDER BY doc_id
"""


# --- the composed curation pipeline: what a training-data run actually
#     executes — normalize-fingerprint exact dedup (keep min doc_id),
#     quality floor, language allowlist — reported as per-lang corpus
#     stats. One Catalyst plan; each stage reuses the operators above.

_MIN_QUALITY = 0.3
_KEEP_LANGS = ("en", "de", "fr", "es")


def q_curation_pipeline(spark, sf_dir):
    from pyspark.sql import Window as W

    docs = load(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        "lang",
        _quality_expr().alias("quality"),
        _ws_tokens_expr().alias("ws_tokens"),
        F.sha2(_norm_expr(), 256).alias("fp"),
    )
    keeper = F.min("doc_id").over(W.partitionBy("fp"))
    kept = (
        staged.withColumn("keeper", keeper)
        .where(
            (F.col("doc_id") == F.col("keeper"))
            & (F.col("quality") >= _MIN_QUALITY)
            & F.col("lang").isin(*_KEEP_LANGS)
        )
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ws_tokens").alias("total_tokens"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
        )
        .orderBy("lang")
    )


def _sql_curation_pipeline() -> str:
    langs = ", ".join(f"'{x}'" for x in _KEEP_LANGS)
    return rf"""
WITH staged AS (
  SELECT doc_id, lang,
         {_SQL_QUALITY} AS quality,
         {_SQL_WS_TOKENS} AS ws_tokens,
         sha256({_SQL_NORM}) AS fp
  FROM documents
),
kept AS (
  SELECT * FROM (
    SELECT s.*, min(doc_id) OVER (PARTITION BY fp) AS keeper FROM staged s
  ) WHERE doc_id = keeper AND quality >= {_MIN_QUALITY} AND lang IN ({langs})
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(ws_tokens) AS BIGINT) AS total_tokens,
       round(avg(quality), 6) AS avg_quality
FROM kept GROUP BY lang ORDER BY lang
"""


def q_repetition_signals(spark, sf_dir):
    """Gopher-style repetition quality signals (public Rae et al. 2021
    filters, word-level): per document the distinct-word ratio, the
    most-frequent-word fraction, and the most-frequent-bigram fraction —
    the signals that flag degenerate ("batch batch batch") generations a
    training-data pipeline must drop. Pure higher-order Catalyst array
    expressions (transform/filter/zip_with) — no explode, no shuffle
    beyond the final per-language aggregate; per-row cost is
    O(distinct × words), JVM-vectorized."""
    docs = load(spark, sf_dir, "documents")
    words = F.split(F.trim("text"), r"\s+")
    n = F.size(words)
    top_word = F.array_max(
        F.transform(
            F.array_distinct(words),
            lambda w: F.size(F.filter(words, lambda x: x == w)),
        )
    )
    bigrams = F.zip_with(
        F.expr(r"slice(split(trim(text), '\\s+'), 1, size(split(trim(text), '\\s+')) - 1)"),
        F.expr(r"slice(split(trim(text), '\\s+'), 2, size(split(trim(text), '\\s+')) - 1)"),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    top_bigram = F.array_max(
        F.transform(
            F.array_distinct(bigrams),
            lambda w: F.size(F.filter(bigrams, lambda x: x == w)),
        )
    )
    per_doc = docs.select(
        "doc_id",
        "lang",
        F.round(F.size(F.array_distinct(words)) / n, 6).alias("distinct_ratio"),
        F.round(top_word / n, 6).alias("top_word_frac"),
        F.round(top_bigram / F.greatest(n - 1, F.lit(1)), 6).alias("top_bigram_frac"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("distinct_ratio"), 6).alias("avg_distinct_ratio"),
            F.round(F.avg("top_word_frac"), 6).alias("avg_top_word_frac"),
            F.sum(
                (F.col("top_bigram_frac") > 0.08).cast("long")
            ).alias("n_repetitive"),
        )
        .orderBy("lang")
    )


SQL_REPETITION_SIGNALS = r"""
WITH per_doc AS (
  SELECT doc_id, lang,
         string_split_regex(trim(text), '\s+') AS w,
         len(string_split_regex(trim(text), '\s+')) AS n
  FROM documents
),
sig AS (
  SELECT doc_id, lang, n,
         round(len(list_distinct(w)) / n, 6) AS distinct_ratio,
         round(list_max(list_transform(list_distinct(w),
               t -> len(list_filter(w, x -> x = t)))) / n, 6)
             AS top_word_frac,
         round(list_max(list_transform(list_distinct(
                   list_transform(range(1, n), i -> w[i] || ' ' || w[i+1])),
               t -> len(list_filter(
                   list_transform(range(1, n), i -> w[i] || ' ' || w[i+1]),
                   x -> x = t)))) / greatest(n - 1, 1), 6)
             AS top_bigram_frac
  FROM per_doc
)
SELECT lang, count(*) AS n_docs,
       round(avg(distinct_ratio), 6) AS avg_distinct_ratio,
       round(avg(top_word_frac), 6) AS avg_top_word_frac,
       CAST(sum(CASE WHEN top_bigram_frac > 0.08 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_repetitive
FROM sig GROUP BY lang ORDER BY lang
"""


# --- corpus vocabulary (tokenizer-training prep): term + document
#     frequency per token, top-k by tf. Scale shape: explode is a per-row
#     projection; the groupBy(token) is ONE shuffle with map-side partial
#     agg (count + count_distinct partials); top-k is TakeOrderedAndProject
#     (per-partition heaps, never a global sort materialization). At
#     100 TB the token key space is Zipf-skewed but each group reduces to
#     two counters — partial agg absorbs the skew, no salting needed.

VOCAB_TOPK = 100


def q_vocab_topk(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("token"),
    ).where(F.length("token") > 0)
    return (
        toks.groupBy("token")
        .agg(
            F.count("*").alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.desc("tf"), "token")
        .limit(VOCAB_TOPK)
    )


SQL_VOCAB_TOPK = rf"""
SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
FROM (SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
      FROM documents)
WHERE length(token) > 0
GROUP BY token ORDER BY tf DESC, token LIMIT {VOCAB_TOPK}
"""


# --- PII redaction: scrub emails / IPv4 / long ID-like digit runs -----
#     Sequential regexp_replace projection — pure codegen, zero shuffle,
#     zero Python; at 100 TB this pipelines inside the scan stage like
#     every other per-row scrub. Counts are taken on the text each
#     pattern actually sees (post prior replacements), so the numbers
#     are exactly "occurrences redacted", not "occurrences in the raw
#     text" — the two differ when an earlier token rewrite destroys a
#     later match. Patterns are ASCII-safe in both Java regex (Spark)
#     and RE2 (DuckDB): \b, \d, {m,n} behave identically on ASCII text.

PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("idnum", r"\b\d{9,12}\b", "<ID>"),
]


def redact_pii(df, text_col: str = "text", out_col: str = "clean_text"):
    """Add per-pattern redaction counts (``n_email``/``n_ipv4``/
    ``n_idnum``) and the scrubbed text as ``out_col``. Replacement
    tokens contain no digits or '@', so a rewrite can never create a
    new match for a later pattern."""
    cur = F.col(text_col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).cast("int").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, token)
    return df.select("*", *counts, cur.alias(out_col))


def q_pii_redaction(spark, sf_dir):
    """Redaction counts + scrubbed-content sha per doc. The synthetic
    corpus contains no natural PII, so the query first seeds each doc
    with deterministic doc_id-derived PII (an email, an IPv4, a 9-digit
    account number) — making every count non-zero and the content hash
    sensitive to any replacement drift."""
    docs = load(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com at 10.2."),
            (F.col("doc_id") % 250).cast("string"),
            F.lit(".7 acct 123456789"),
        ).alias("text"),
    )
    return (
        redact_pii(seeded)
        .select(
            "doc_id",
            "n_email",
            "n_ipv4",
            "n_idnum",
            F.sha2("clean_text", 256).alias("clean_sha"),
        )
        .orderBy("doc_id")
    )


def _sql_pii_redaction() -> str:
    cols, cur = [], "text"
    for name, pat, token in PII_PATTERNS:
        cols.append(
            f"CAST(len(regexp_extract_all({cur}, '{pat}')) AS INT) AS n_{name}"
        )
        cur = f"regexp_replace({cur}, '{pat}', '{token}', 'g')"
    counts = ",\n       ".join(cols)
    return rf"""
WITH seeded AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@mail.example.com at 10.2.'
              || (doc_id % 250) || '.7 acct 123456789' AS text
  FROM documents
)
SELECT doc_id,
       {counts},
       sha256({cur}) AS clean_sha
FROM seeded ORDER BY doc_id
"""


QUERIES = {
    "token_count": (q_token_count, SQL_TOKEN_COUNT),
    "pii_redaction": (q_pii_redaction, _sql_pii_redaction()),
    "vocab_topk": (q_vocab_topk, SQL_VOCAB_TOPK),
    "quality_score": (q_quality_score, SQL_QUALITY_SCORE),
    "lang_id": (q_lang_id, _sql_lang_id()),
    "fingerprint": (q_fingerprint, SQL_FINGERPRINT),
    "curation_pipeline": (q_curation_pipeline, _sql_curation_pipeline()),
    "repetition_signals": (q_repetition_signals, SQL_REPETITION_SIGNALS),
}
