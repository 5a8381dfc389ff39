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


def test_hot_bucket_cap_bounds_duplicate_clusters(spark):
    """A degenerate cluster (5k identical docs → one LSH band bucket of
    5k > MAX_BUCKET) must contribute ZERO candidate pairs instead of
    k² ≈ 12.5M, while normal-size near-dup groups still pair up."""
    from fhirflat_spark.operators.dedup import (
        MAX_BUCKET,
        N_HASHES,
        _lsh_pairs_from_sigs,
    )

    n_cluster = MAX_BUCKET + 1000
    rows = [(i, *[777] * N_HASHES) for i in range(n_cluster)]
    # two small near-dup docs with a distinct shared signature
    rows += [(n_cluster, *[55] * N_HASHES), (n_cluster + 1, *[55] * N_HASHES)]
    sigs = spark.createDataFrame(
        rows, ["doc_id", *[f"mh{i}" for i in range(N_HASHES)]]
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in _lsh_pairs_from_sigs(sigs).collect()}
    assert (n_cluster, n_cluster + 1) in pairs  # normal pair survives
    assert len(pairs) == 1, (
        f"capped cluster leaked {len(pairs) - 1} pairs into the join"
    )


def test_embedding_neardup_lsh_recall(spark, tmp_path):
    """ADVICE r2: the LSH sign-bucket prefilter approximates the exact
    within-label cosine>=0.95 pair set, and the shipped fixtures contain
    ZERO such pairs (r2 gate: 0 rows) — so the oracle can never see a
    recall loss. Pin it here on a synthetic fixture with KNOWN near-dup
    clusters, including clusters engineered to flip >=2 sign bits (the
    designed miss case): LSH output must be a SUBSET of the exact set
    (candidates are exactly rescored, so no false positives) and recall
    must stay above a floor."""
    import numpy as np
    import pandas as pd

    from fhirflat_spark.operators.similarity import (
        _cosine,
        q_embedding_neardup_pairs,
    )

    rng = np.random.default_rng(7)
    dim = 64
    rows = []
    vid = 0
    for cluster in range(20):
        base = rng.normal(size=dim).astype("float32")
        # half the clusters sit NEAR the sign boundary on several of the
        # first 6 dims (tiny magnitudes) so per-vector noise can flip >=2
        # sign bits — the geometry the hamming<=1 probes can miss
        if cluster % 2 == 0:
            base[:6] = rng.normal(scale=0.003, size=6)
        for _ in range(3):
            noisy = base + rng.normal(scale=0.01, size=dim).astype("float32")
            rows.append((vid, [float(x) for x in noisy], cluster % 4))
            vid += 1
    # background vectors (no near dups)
    for _ in range(40):
        rows.append((vid, [float(x) for x in rng.normal(size=dim)], vid % 4))
        vid += 1
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        pdf, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{sf_dir}/embeddings.parquet")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a, b = emb.alias("a"), emb.alias("b")
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in (
            a.join(b, F.col("a.label") == F.col("b.label"))
            .where(F.col("a.vec_id") < F.col("b.vec_id"))
            .select(
                F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
                F.round(
                    _cosine(F.col("a.embedding"), F.col("b.embedding")), 4
                ).alias("cosine"),
            )
            .where(F.col("cosine") >= 0.95)
            .collect()
        )
    }
    # explicit production-grade threshold: the module default is tuned to
    # the shipped near-orthogonal fixtures (see NEARDUP_COSINE docstring)
    lsh = {
        (r["vec_a"], r["vec_b"])
        for r in q_embedding_neardup_pairs(spark, sf_dir, threshold=0.95).collect()
    }
    assert lsh <= exact, f"LSH emitted non-near-dup pairs: {lsh - exact}"
    assert exact, "fixture has no near-dup pairs to measure recall on"
    recall = len(lsh) / len(exact)
    # hamming<=1 probes over 6 sign bits: pairs whose buckets differ in
    # 2+ bits are missed by design; the floor pins the observed regime
    assert recall >= 0.5, f"LSH recall collapsed: {recall:.3f}"


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


def test_connected_components_chain_and_islands(spark):
    """CC must label TRANSITIVE groups (a-b, b-c, c-d collapse to one
    cluster even though a and d never pair) and keep islands apart —
    the property that distinguishes cluster dedup from pair dedup."""
    from fhirflat_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a long, doc_b long",
    )
    got = {
        r["node"]: r["cluster"]
        for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_connected_components_long_path(spark):
    """A path graph needs diameter/2-ish propagation rounds — pin that
    convergence detection actually iterates past round one."""
    from fhirflat_spark.operators.dedup import connected_components

    n = 12
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )
    got = connected_components(pairs)
    assert got.where(F.col("cluster") != 0).count() == 0
    assert got.count() == n + 1
