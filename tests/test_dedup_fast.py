"""Structural invariants for the xxhash64 (production) minhash family —
the fast variant has no DuckDB value oracle (xxhash64 isn't available
there), so its correctness is pinned by properties instead:

1. determinism: two runs produce identical signatures;
2. identical texts ⟹ identical signatures ⟹ LSH pairs find them;
3. fast LSH candidate pairs agree with the sha-family pairs on exact
   duplicates (both families MUST recover content-equal docs);
4. signature agreement approximates jaccard the same way for both
   families on the same corpus (mean |est_fast − est_sha| small).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from fhirflat_spark.operators.dedup import (
    q_minhash_lsh_pairs,
    q_minhash_lsh_pairs_fast,
    q_minhash_signatures_fast,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_fast_signatures_deterministic(spark):
    a = q_minhash_signatures_fast(spark, SF_DIR).collect()
    b = q_minhash_signatures_fast(spark, SF_DIR).collect()
    assert a == b
    assert len(a) > 0


def test_fast_lsh_finds_exact_duplicates(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    dup_pairs = (
        docs.alias("a")
        .join(docs.alias("b"), F.col("a.text") == F.col("b.text"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .collect()
    )
    fast = {(r["doc_a"], r["doc_b"]) for r in q_minhash_lsh_pairs_fast(spark, SF_DIR).collect()}
    sha = {(r["doc_a"], r["doc_b"]) for r in q_minhash_lsh_pairs(spark, SF_DIR).collect()}
    for p in ((r["doc_a"], r["doc_b"]) for r in dup_pairs):
        assert p in fast, f"fast LSH missed exact duplicate {p}"
        assert p in sha, f"sha LSH missed exact duplicate {p}"


def test_fast_and_sha_candidate_sets_overlap(spark):
    """Different hash families, same banding: candidate sets aren't equal,
    but on a corpus with real near-dups they must overlap heavily (both
    approximate the same jaccard ≥ band-threshold set)."""
    fast = {(r["doc_a"], r["doc_b"]) for r in q_minhash_lsh_pairs_fast(spark, SF_DIR).collect()}
    sha = {(r["doc_a"], r["doc_b"]) for r in q_minhash_lsh_pairs(spark, SF_DIR).collect()}
    assert fast and sha
    jac = len(fast & sha) / len(fast | sha)
    # k=8 hashes / 2 bands is deliberately small (oracle-sized); band
    # collisions are noisy at that k, so ~0.48 observed overlap is the
    # expected regime — the invariant guards against a broken hash
    # (overlap ≈ 0) without over-pinning LSH randomness
    assert jac > 0.3, f"fast/sha candidate overlap too low: {jac:.3f}"
