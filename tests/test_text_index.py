"""Inverted token index (text_index.py): search ≡ full-scan filter,
posting-based pruning actually skips partitions, incremental refresh is
bit-equal to a rebuild under appends, deletes keep results exact through
the over-approximate postings, and history resets rebuild."""

from __future__ import annotations

import glob
import json

import pytest
from pyspark.sql import functions as F

from fhirflat_spark.encode import append_table, encode_table
from fhirflat_spark.text_index import (
    build_token_index,
    lookup_parts,
    read_token_index,
    refresh_token_index,
    search_token,
    token_matches,
)

SF = "/root/testdata/sf0.01"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def corpus(spark):
    # plant a rare marker token in a handful of docs so the posting set
    # is a strict subset of partitions (the synthetic corpus's 30-word
    # vocabulary appears nearly everywhere)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 97 == 0,
               F.concat(F.col("text"), F.lit(" rare_marker_tok")))
        .otherwise(F.col("text")),
    )


@pytest.fixture()
def table(spark, corpus, tmp_path):
    out = str(tmp_path / "t")
    # small buckets → many partitions, so pruning is observable
    encode_table(corpus, out, rows_per_bucket=50)
    idx = str(tmp_path / "idx")
    build_token_index(spark, out, idx)
    return out, idx


def test_search_equals_full_scan(spark, corpus, table):
    out, idx = table
    for tok in ("rare_marker_tok", "dup", "customer"):
        got = search_token(spark, out, idx, tok,
                           columns=["doc_id", "lang"])
        want = corpus.where(token_matches("text", tok)).select(
            "doc_id", "lang"
        )
        assert _rows(got) == _rows(want), tok


def test_posting_lookup_prunes_partitions(spark, table):
    out, idx = table
    from fhirflat_spark.manifest import current_snapshot, snapshot_part_ids

    total = len(snapshot_part_ids(out, current_snapshot(out)))
    hit = lookup_parts(idx, "rare_marker_tok")
    assert 0 < len(hit) < total  # strict subset: the index skips IO
    assert lookup_parts(idx, "no_such_token_anywhere") == []


def test_search_missing_token_empty_with_schema(spark, table):
    out, idx = table
    got = search_token(spark, out, idx, "no_such_token_anywhere",
                       columns=["doc_id", "lang"])
    assert got.columns == ["doc_id", "lang"]
    assert got.count() == 0


def test_refresh_equals_rebuild_under_append(spark, corpus, tmp_path):
    out = str(tmp_path / "t2")
    base = corpus.where(F.col("doc_id") % 2 == 0)
    delta = corpus.where(F.col("doc_id") % 2 == 1)
    encode_table(base, out, rows_per_bucket=50)
    idx = str(tmp_path / "idx2")
    build_token_index(spark, out, idx)
    append_table(delta, out, rows_per_bucket=50)
    meta = refresh_token_index(spark, out, idx)
    assert meta["snapshot"] == 2
    rebuilt_dir = str(tmp_path / "idx2_rebuilt")
    build_token_index(spark, out, rebuilt_dir)
    assert _rows(read_token_index(spark, idx)) == _rows(
        read_token_index(spark, rebuilt_dir)
    )
    # refresh is a no-op when current (meta object returned unchanged)
    assert refresh_token_index(spark, out, idx)["snapshot"] == 2


def test_deletes_keep_search_exact_via_residual(spark, corpus, table):
    out, idx = table
    from fhirflat_spark.manifest import delete_rows

    victims = [int(r[0]) for r in corpus.where(
        token_matches("text", "rare_marker_tok")
    ).select("doc_id").limit(2).collect()]
    delete_rows(spark, out, "doc_id", victims)
    # the index is now an over-approximation (postings never shrink) —
    # but decode applies merge-on-read deletes, so results stay exact
    got = search_token(spark, out, idx, "rare_marker_tok",
                       columns=["doc_id"])
    want = corpus.where(
        token_matches("text", "rare_marker_tok")
        & ~F.col("doc_id").isin(victims)
    ).select("doc_id")
    assert _rows(got) == _rows(want)


def test_history_reset_rebuilds(spark, corpus, tmp_path):
    out = str(tmp_path / "t3")
    encode_table(corpus.where(F.col("doc_id") < 100), out,
                 rows_per_bucket=50)
    idx = str(tmp_path / "idx3")
    build_token_index(spark, out, idx)
    # fresh re-encode: same version number (1), different content — the
    # pinned snapshot sha must force a rebuild, not a stale no-op
    encode_table(corpus.where(F.col("doc_id") >= 400), out,
                 rows_per_bucket=50)
    meta = refresh_token_index(spark, out, idx)
    assert meta["snapshot"] == 1
    got = search_token(spark, out, idx, "dup", columns=["doc_id"])
    want = corpus.where(
        (F.col("doc_id") >= 400) & token_matches("text", "dup")
    ).select("doc_id")
    assert _rows(got) == _rows(want)


def test_refresh_reads_only_new_partitions(spark, corpus, tmp_path):
    """Delta-proportional refresh: the incremental pass must not re-read
    snapshot-1 chunk files (cost ∝ appended data — the 100-TB contract).
    Proven by making the old chunk payloads unreadable."""
    out = str(tmp_path / "t4")
    encode_table(corpus.where(F.col("doc_id") % 2 == 0), out,
                 rows_per_bucket=50)
    idx = str(tmp_path / "idx4")
    build_token_index(spark, out, idx)
    old_chunks = glob.glob(f"{out}/chunks/*/*.parquet")
    saved = {p: open(p, "rb").read() for p in old_chunks}
    append_table(corpus.where(F.col("doc_id") % 2 == 1), out,
                 rows_per_bucket=50)
    new_chunks = set(glob.glob(f"{out}/chunks/*/*.parquet")) - set(saved)
    for p in saved:  # poison the old payloads
        with open(p, "wb") as f:
            f.write(b"not parquet")
    try:
        meta = refresh_token_index(spark, out, idx)
    finally:
        for p, blob in saved.items():
            with open(p, "wb") as f:
                f.write(blob)
    assert meta["snapshot"] == 2 and new_chunks
    # and the merged index equals a rebuild on the healed table
    rebuilt = str(tmp_path / "idx4_rebuilt")
    build_token_index(spark, out, rebuilt)
    assert _rows(read_token_index(spark, idx)) == _rows(
        read_token_index(spark, rebuilt)
    )


def test_multi_token_and_search(spark, corpus, table):
    from fhirflat_spark.text_index import search_all_tokens

    out, idx = table
    got = search_all_tokens(spark, out, idx,
                            ["rare_marker_tok", "customer"],
                            columns=["doc_id"])
    want = corpus.where(
        token_matches("text", "rare_marker_tok")
        & token_matches("text", "customer")
    ).select("doc_id")
    assert _rows(got) == _rows(want) and got.count() > 0
    # conjunction with an absent token: empty, schema preserved
    none = search_all_tokens(spark, out, idx,
                             ["rare_marker_tok", "no_such_token_xyz"],
                             columns=["doc_id"])
    assert none.columns == ["doc_id"] and none.count() == 0


def test_meta_records_lineage(spark, table):
    out, idx = table
    meta = json.loads(open(f"{idx}/text_index.json").read())
    assert meta["snapshot"] == 1
    assert meta["snapshot_sha"] and meta["dataset_sha256"]
