"""Sequence packing (operators/packing.py): the distributed prefix sum
must equal the single-stream cumulative sum across any partitioning,
bins must partition the corpus contiguously with bounded overflow, and
the plan must never collapse into a single-task global window."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from fhirflat_spark.operators.packing import pack_documents, prefix_sum


def _docs(spark, n=500, seed=5, parts=7):
    rng = random.Random(seed)
    rows = [(i, rng.randint(1, 900)) for i in range(n)]
    return spark.createDataFrame(rows, ["doc_id", "n_tokens"]).repartition(
        parts
    )


def test_prefix_sum_matches_serial(spark):
    df = _docs(spark)
    got = {
        r["doc_id"]: r["cum"]
        for r in prefix_sum(df, "doc_id", "n_tokens", num_partitions=5)
        .collect()
    }
    rows = sorted(
        (r["doc_id"], r["n_tokens"]) for r in df.collect()
    )
    acc = 0
    for i, t in rows:
        acc += t
        assert got[i] == acc


def test_prefix_sum_invariant_under_input_partitioning(spark):
    a = prefix_sum(_docs(spark, parts=3), "doc_id", "n_tokens",
                   num_partitions=4)
    b = prefix_sum(_docs(spark, parts=11), "doc_id", "n_tokens",
                   num_partitions=2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pack_bins_contiguous_and_bounded(spark):
    budget = 2000
    df = _docs(spark, 400)
    packed = pack_documents(df, "doc_id", "n_tokens", budget).collect()
    assert len(packed) == 400  # every doc assigned exactly once
    by_bin: dict[int, list] = {}
    for r in sorted(packed, key=lambda r: r["doc_id"]):
        by_bin.setdefault(r["bin_id"], []).append(r)
    max_doc = max(r["n_tokens"] for r in packed)
    last = None
    for b in sorted(by_bin):
        rows = by_bin[b]
        # contiguity: bins cover consecutive doc_id ranges in order
        ids = [r["doc_id"] for r in rows]
        assert ids == list(range(min(ids), max(ids) + 1))
        if last is not None:
            assert min(ids) == last + 1
        last = max(ids)
        # fill bound: a bin stops within one document of the budget
        total = sum(r["n_tokens"] for r in rows)
        assert total < budget + max_doc
        # every bin except possibly the final one reaches the budget
        if b != max(by_bin):
            assert total >= budget - max_doc


def test_pack_shuffled_order_is_deterministic(spark):
    df = _docs(spark, 300)
    a = sorted(
        (r["doc_id"], r["bin_id"])
        for r in pack_documents(
            df, "doc_id", "n_tokens", 1500, shuffle_seed="s1"
        ).collect()
    )
    b = sorted(
        (r["doc_id"], r["bin_id"])
        for r in pack_documents(
            df.repartition(3), "doc_id", "n_tokens", 1500, shuffle_seed="s1"
        ).collect()
    )
    c = sorted(
        (r["doc_id"], r["bin_id"])
        for r in pack_documents(
            df, "doc_id", "n_tokens", 1500, shuffle_seed="s2"
        ).collect()
    )
    assert a == b      # same seed: identical packing anywhere
    assert a != c      # different seed: different shuffle order


def test_prefix_sum_plan_never_single_partition(spark):
    df = _docs(spark, 200)
    plan = (
        prefix_sum(df, "doc_id", "n_tokens", num_partitions=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning" in plan
    assert "SinglePartition" not in plan  # the global-window scale trap
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------- chunking


def test_chunk_windows_cover_every_token(spark):
    """Union of [start, start+len) spans = [0, n) for every doc, interior
    chunks overlap by exactly window - stride, and the final chunk always
    reaches the last token."""
    from fhirflat_spark.operators.packing import chunk_documents

    texts = [
        (1, " ".join(f"t{i}" for i in range(50))),   # n > window, tail ragged
        (2, " ".join(f"t{i}" for i in range(16))),   # n == window
        (3, " ".join(f"t{i}" for i in range(7))),    # n < window
        (4, "solo"),                                  # single token
    ]
    df = spark.createDataFrame(texts, "doc_id bigint, text string")
    rows = chunk_documents(df, "text", 16, 12).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in texts:
        n = len(text.split())
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_id)
        assert chunks[0].chunk_id == 0
        covered = set()
        for c in chunks:
            start = c.chunk_id * 12
            assert c.chunk_tokens == min(16, n - start)
            covered.update(range(start, start + c.chunk_tokens))
        assert covered == set(range(n)), doc_id
        if n <= 16:
            assert len(chunks) == 1
        else:
            # interior overlap: each next chunk re-reads window-stride tokens
            assert chunks[1].chunk_id * 12 < 16


def test_chunk_documents_rejects_bad_stride(spark):
    from fhirflat_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(df, "text", 8, 9)   # stride > window: gaps
    with _pytest.raises(ValueError):
        chunk_documents(df, "text", 8, 0)


def test_chunk_plan_no_shuffle_no_python(spark):
    from fhirflat_spark.operators.packing import chunk_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = chunk_documents(docs, "text", 16, 12)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan           # pure per-row projection
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
