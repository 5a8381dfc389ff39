"""Derived-dataset fuzzer: the three changelog-pinned derived datasets
(continuous rollup, inverted token index, IVF vector index) refreshed
after every random table mutation must stay EXACT at their contracts:

- rollup: incremental refresh == from-scratch recompute (bit-equal rows);
- token search: index-pruned search == full-scan predicate (postings may
  over-approximate under deletes/upserts, results may not);
- vector search at nprobe=K == brute-force cosine top-k, and postings ==
  one frozen-centroid reassignment of the whole table.

The per-feature suites prove each refresh path in isolation; this file
interleaves them with append / upsert / equality delete / position
delete / rollback / maintain so the lineage guards (snapshot regression,
content-sha-at-pinned-version, reset-on-compaction) are exercised in
combination on one shared table that carries a timestamp, a text column,
and an embedding column (through the list codec) at once."""

from __future__ import annotations

import datetime as dt
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from fhirflat_spark.decode import decode_table
from fhirflat_spark.encode import append_table, encode_table, upsert_rows
from fhirflat_spark.maintenance import maintain_table
from fhirflat_spark.manifest import delete_rows, delete_rows_at, rollback
from fhirflat_spark.rollup import build_rollup, read_rollup, refresh_rollup
from fhirflat_spark.text_index import (
    build_token_index,
    refresh_token_index,
    search_token,
    token_matches,
)
from fhirflat_spark.vector_index import (
    _postings,
    build_vector_index,
    load_centroids,
    read_vector_index,
    refresh_vector_index,
    search_vectors,
)

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)
DIM = 8
K = 3
COLS = ["doc_id", "ts", "kind", "cents", "text", "embedding"]


def _vec(i: int) -> list[float]:
    # deterministic pseudo-embedding: a pure function of the id
    return [float(round(np.sin(0.7 * i + j * j), 6)) for j in range(DIM)]


def _row(i: int, salt: int = 0):
    return (
        int(i),
        T0 + dt.timedelta(hours=(i + salt) % 4, minutes=i % 60),
        f"t{(i + salt) % 2}",
        int(i * 10 + salt),
        f"alpha{(i + salt) % 7} beta{i % 3} idtok{i}",
        _vec(i + salt),
    )


def _df(spark, rows):
    return spark.createDataFrame(
        rows,
        "doc_id BIGINT, ts TIMESTAMP, kind STRING, cents BIGINT, "
        "text STRING, embedding ARRAY<DOUBLE>",
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


_SEEDS = [
    int(s) for s in __import__("os").environ.get(
        "SPARK_GRAFT_IDX_FUZZ_SEEDS", "11"
    ).split(",")
]


@pytest.mark.parametrize("seed", _SEEDS)
def test_derived_indexes_stay_exact(spark, tmp_path, seed):
    rng = random.Random(seed)
    out = str(tmp_path / "t")
    rdir, tdir, vdir = (str(tmp_path / d) for d in ("rup", "tok", "vec"))

    next_id = 150
    model = {i: _row(i) for i in range(next_id)}
    encode_table(_df(spark, list(model.values())), out, rows_per_bucket=40)
    build_rollup(spark, out, rdir, ts_col="ts", bucket="hour",
                 group_cols=("kind",), sum_cols=("cents",))
    build_token_index(spark, out, tdir, text_col="text")
    build_vector_index(spark, out, vdir, vector_col="embedding",
                       id_col="doc_id", k=K)
    history = []

    def check(step):
        # rollup: incremental == recompute
        refresh_rollup(spark, out, rdir)
        got = _rows(read_rollup(spark, rdir))
        want = _rows(
            decode_table(spark, out)
            .groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket"),
                     "kind")
            .agg(F.count("*").cast("long").alias("n"),
                 F.sum("cents").alias("cents_sum"))
        )
        assert got == want, f"seed={seed} step={step} rollup diverged"
        # token index: pruned search == full-scan predicate
        refresh_token_index(spark, out, tdir)
        tok = f"alpha{rng.randrange(7)}"
        got = _rows(search_token(spark, out, tdir, tok,
                                 columns=["doc_id", "text"]))
        want = _rows(
            decode_table(spark, out, columns=["doc_id", "text"])
            .where(token_matches("text", tok))
        )
        assert got == want, f"seed={seed} step={step} token search diverged"
        # vector index: full-probe search == brute force; postings ==
        # frozen reassignment of the whole table
        refresh_vector_index(spark, out, vdir)
        q = _vec(rng.choice(sorted(model)))
        qlit = F.array(*[F.lit(float(x)) for x in q])
        from fhirflat_spark.operators.similarity import _cosine

        got = [tuple(r) for r in search_vectors(
            spark, out, vdir, q, top_k=5, nprobe=K).collect()]
        want = [tuple(r) for r in (
            decode_table(spark, out, columns=["doc_id", "embedding"])
            .select("doc_id",
                    F.round(_cosine(F.col("embedding"), qlit), 4)
                    .alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("doc_id")).limit(5)
        ).collect()]
        assert got == want, f"seed={seed} step={step} vector search diverged"
        # postings are a documented OVER-approximation under deletes /
        # upserts (a delete never shrinks them): every (cell, part) a
        # frozen reassignment of the CURRENT rows produces must be
        # covered with at least its count — never under-counted, which
        # would let pruning skip a partition that still has matches
        post = {(r["cell"], r["part_id"]): r["n_vecs"]
                for r in read_vector_index(spark, vdir).collect()}
        full = decode_table(spark, out, columns=["doc_id", "embedding"],
                            with_positions=True)
        for r in _postings(full, load_centroids(vdir),
                           "embedding").collect():
            key = (r["cell"], r["part_id"])
            assert post.get(key, 0) >= r["n_vecs"], (
                f"seed={seed} step={step} posting under-counts {key}"
            )

    from fhirflat_spark.manifest import current_snapshot

    ops = ["append", "upsert", "delete", "posdelete", "rollback",
           "maintain"]
    weights = [4, 3, 3, 2, 1, 1]
    trace = []
    for step in range(8):
        op = rng.choices(ops, weights)[0]
        trace.append(op)
        if op == "append":
            ids = range(next_id, next_id + rng.randrange(20, 50))
            next_id = ids.stop
            rows = [_row(i) for i in ids]
            append_table(_df(spark, rows), out, rows_per_bucket=40)
            model.update({r[0]: r for r in rows})
        elif op == "upsert":
            live = sorted(model)
            touch = rng.sample(live, min(len(live), rng.randrange(5, 25)))
            rows = [_row(i, salt=step + 1) for i in touch]
            upsert_rows(_df(spark, rows), out, "doc_id", rows_per_bucket=40)
            model.update({r[0]: r for r in rows})
        elif op == "delete":
            live = sorted(model)
            doomed = rng.sample(live, min(len(live), rng.randrange(5, 20)))
            delete_rows(spark, out, "doc_id", doomed)
            for i in doomed:
                model.pop(i, None)
        elif op == "posdelete":
            live = sorted(model)
            doomed = rng.sample(live, min(len(live), rng.randrange(3, 10)))
            pos = (
                decode_table(spark, out, with_positions=True)
                .where(F.col("doc_id").isin([int(d) for d in doomed]))
                .select(F.col("__part_id").alias("part_id"),
                        F.col("__chunk_seq").alias("chunk_seq"),
                        F.col("__row_idx").alias("row_idx"))
            )
            delete_rows_at(spark, out, pos)
            for i in doomed:
                model.pop(i, None)
        elif op == "rollback":
            if not history:
                continue
            v, snap = rng.choice(history)
            rollback(spark, out, v)
            model = dict(snap)
        elif op == "maintain":
            maintain_table(spark, out, rows_per_bucket=40, keep_snapshots=2)
            history.clear()  # lineage may have reset
        history.append((current_snapshot(out), dict(model)))
        # table itself must match the model before judging the indexes
        got = _rows(decode_table(spark, out).select(*COLS))
        assert got == sorted(model.values()), (
            f"seed={seed} step={step} trace={trace}"
        )
        check(step)
