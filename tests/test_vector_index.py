"""IVF vector index: exactness at full probe, partition pruning on a
clustered layout, frozen-centroid refresh ≡ full reassignment, and
history-reset detection."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fhirflat_spark.decode import decode_table
from fhirflat_spark.encode import append_table, encode_table
from fhirflat_spark.manifest import read_summary
from fhirflat_spark.operators.similarity import _cosine
from fhirflat_spark.vector_index import (
    build_vector_index,
    load_centroids,
    lookup_parts,
    probe_cells,
    read_vector_index,
    refresh_vector_index,
    search_vectors,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
K = 4
TOP = 8


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def vstore(spark, emb, tmp_path_factory):
    """Cell-clustered layout — the production flow: train the coarse
    quantizer, lay the table out sorted by assigned cell (the same play
    as z-order for range predicates), then index the clustered table.
    Pruning is then geometric-distribution-independent: each cell's
    vectors live in a contiguous handful of partitions."""
    from fhirflat_spark.operators.similarity import assign_cells, train_centroids

    root = tmp_path_factory.mktemp("vix")
    out = str(root / "store")
    n = emb.count()
    per_bucket = max(10, n // 8)
    C = train_centroids(emb.select("vec_id", "embedding"), K)
    clustered = (
        assign_cells(emb, C)
        .repartitionByRange(8, "cell", "vec_id")
        .sortWithinPartitions("cell", "vec_id")
        .drop("cell")
    )
    # layout-preserving encode: the cell-range partitioning IS the
    # physical layout (shuffle=True would round-robin it away)
    encode_table(clustered, out, rows_per_bucket=per_bucket, shuffle=False)
    idx = str(root / "index")
    # train_centroids is deterministic over the same rows (init by id
    # order, fixed Lloyd rounds), so the index's quantizer IS `C`
    build_vector_index(spark, out, idx, k=K)
    return out, idx


def _query_vec(emb, vec_id=0):
    return emb.where(F.col("vec_id") == vec_id).collect()[0]["embedding"]


def _brute_topk(spark, store, q, top, exclude, parts=None):
    df = decode_table(spark, store, columns=["vec_id", "embedding"],
                      part_ids=parts)
    qlit = F.array(*[F.lit(float(x)) for x in q])
    return (
        df.where(F.col("vec_id") != exclude)
        .select("vec_id",
                F.round(_cosine(F.col("embedding"), qlit), 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(top)
        .collect()
    )


def test_full_probe_equals_brute_force(spark, emb, vstore):
    store, idx = vstore
    q = _query_vec(emb)
    got = search_vectors(spark, store, idx, q, top_k=TOP, nprobe=K,
                         exclude_id=0).collect()
    want = _brute_topk(spark, store, q, TOP, exclude=0)
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_low_probe_prunes_partitions(spark, emb, vstore):
    store, idx = vstore
    q = _query_vec(emb)
    total = read_summary(spark, store)["num_partitions"]
    cells = probe_cells(idx, q, 1)
    parts = lookup_parts(idx, cells)
    assert len(cells) == 1
    assert 0 < len(parts) < total, (parts, total)
    # the query's own cell is probed first, so the query vector itself
    # is always reachable at nprobe=1
    got = search_vectors(spark, store, idx, q, top_k=TOP, nprobe=1).collect()
    assert got and got[0]["vec_id"] == 0 and got[0]["cosine"] == 1.0


def test_low_probe_exact_within_probed_parts(spark, emb, vstore):
    """The IVF contract: results are the exact top-k restricted to the
    probed cells' partitions."""
    store, idx = vstore
    q = _query_vec(emb, vec_id=7)
    parts = lookup_parts(idx, probe_cells(idx, q, 2))
    got = search_vectors(spark, store, idx, q, top_k=TOP, nprobe=2,
                         exclude_id=7).collect()
    want = _brute_topk(spark, store, q, TOP, exclude=7, parts=parts)
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_driver_fast_path_equals_spark_path_and_skips_decode(
        spark, emb, vstore, monkeypatch):
    """Point-lookup searches run driver-side (read_parts_arrow + numpy)
    with NO decode_table job, and return exactly what the distributed
    path returns — same ids, same rounded cosines, same schema."""
    import fhirflat_spark.vector_index as vx

    store, idx = vstore
    q = _query_vec(emb, vec_id=3)
    monkeypatch.setattr(vx, "DRIVER_SEARCH_ROWS", -1)  # force Spark path
    want = vx.search_vectors(spark, store, idx, q, top_k=TOP, nprobe=2,
                             exclude_id=3)
    want_rows, want_schema = want.collect(), want.schema
    monkeypatch.setattr(vx, "DRIVER_SEARCH_ROWS", 500_000)

    def boom(*a, **k):
        raise AssertionError("fast path must not call decode_table")

    import fhirflat_spark.decode as dec
    monkeypatch.setattr(dec, "decode_table", boom)
    got = vx.search_vectors(spark, store, idx, q, top_k=TOP, nprobe=2,
                            exclude_id=3)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want_rows]
    assert [(f.name, f.dataType) for f in got.schema.fields] == \
           [(f.name, f.dataType) for f in want_schema.fields]


def test_driver_fast_path_defers_on_deletes(spark, emb, tmp_path):
    """Active row-level deletes → merge-on-read is Spark-side; the fast
    path must defer and the result must exclude deleted rows."""
    from fhirflat_spark.manifest import delete_rows
    from fhirflat_spark.operators.similarity import (
        assign_cells,
        train_centroids,
    )

    store = str(tmp_path / "store")
    n = emb.count()
    C = train_centroids(emb.select("vec_id", "embedding"), K)
    clustered = (
        assign_cells(emb, C)
        .repartitionByRange(4, "cell", "vec_id")
        .sortWithinPartitions("cell", "vec_id").drop("cell")
    )
    encode_table(clustered, store, rows_per_bucket=max(10, n // 4),
                 shuffle=False)
    idx = str(tmp_path / "idx")
    build_vector_index(spark, store, idx, vector_col="embedding",
                       id_col="vec_id", k=K)
    q = _query_vec(emb)
    before = search_vectors(spark, store, idx, q, top_k=1, nprobe=K,
                            exclude_id=0).collect()
    top_id = before[0]["vec_id"]
    delete_rows(spark, store, "vec_id", [top_id])
    after = search_vectors(spark, store, idx, q, top_k=1, nprobe=K,
                           exclude_id=0).collect()
    assert after and after[0]["vec_id"] != top_id


def test_refresh_is_frozen_assignment_of_the_delta(spark, emb, tmp_path):
    from fhirflat_spark.vector_index import _postings

    store = str(tmp_path / "grow")
    idx = str(tmp_path / "gidx")
    lo = emb.where(F.col("vec_id") % 2 == 0)
    hi = emb.where(F.col("vec_id") % 2 == 1)
    encode_table(lo.orderBy("label", "vec_id").coalesce(1), store,
                 rows_per_bucket=20)
    m0 = build_vector_index(spark, store, idx, k=K)
    C = load_centroids(idx)
    append_table(hi.orderBy("label", "vec_id").coalesce(1), store,
                 rows_per_bucket=20)
    m1 = refresh_vector_index(spark, store, idx)
    assert m1["snapshot"] > m0["snapshot"]
    # centroids frozen across refresh
    assert (load_centroids(idx) == C).all()
    # postings == one full assignment pass with the same centroids
    got = sorted(
        tuple(r) for r in read_vector_index(spark, idx).collect()
    )
    full = decode_table(spark, store, columns=["vec_id", "embedding"],
                        with_positions=True)
    want = sorted(tuple(r) for r in _postings(full, C, "embedding").collect())
    assert got == want
    # and search at full probe is still the exact brute-force answer
    q = _query_vec(emb, vec_id=2)
    res = search_vectors(spark, store, idx, q, top_k=TOP, nprobe=K,
                         exclude_id=2).collect()
    brute = _brute_topk(spark, store, q, TOP, exclude=2)
    assert [tuple(r) for r in res] == [tuple(r) for r in brute]
    # no-op refresh returns the same pinned meta
    assert refresh_vector_index(spark, store, idx) == m1


def test_refresh_detects_history_reset(spark, emb, tmp_path):
    store = str(tmp_path / "reset")
    idx = str(tmp_path / "ridx")
    encode_table(
        emb.where(F.col("vec_id") < 30).orderBy("vec_id").coalesce(1),
        store, rows_per_bucket=10,
    )
    build_vector_index(spark, store, idx, k=2)
    # fresh re-encode: same path, different content and history
    import shutil

    shutil.rmtree(store)
    encode_table(
        emb.where(F.col("vec_id") >= 10).orderBy("vec_id").coalesce(1),
        store, rows_per_bucket=10,
    )
    m = refresh_vector_index(spark, store, idx)
    from fhirflat_spark.manifest import current_snapshot, snapshot_dataset_sha

    assert m["snapshot"] == current_snapshot(store)
    assert m["snapshot_sha"] == snapshot_dataset_sha(store, m["snapshot"])
    q = _query_vec(emb, vec_id=20)
    got = search_vectors(spark, store, idx, q, top_k=5, nprobe=2,
                         exclude_id=20).collect()
    want = _brute_topk(spark, store, q, 5, exclude=20)
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_read_parts_arrow_rejects_stale_part_ids(spark, tmp_path):
    """r6 (ADVICE): a part id replaced by a rewrite commit is no longer
    live — read_parts_arrow must raise (routable ValueError) instead of
    silently returning the superseded rows."""
    import pytest as _pytest

    from fhirflat_spark.datagen import gen_spark
    from fhirflat_spark.decode import read_parts_arrow
    from fhirflat_spark.encode import encode_table
    from fhirflat_spark.manifest import current_snapshot, snapshot_part_ids

    out = str(tmp_path / "src")
    encode_table(gen_spark(spark, 1200, seed=5), out, rows_per_bucket=200)
    live = sorted(snapshot_part_ids(out, current_snapshot(out)))
    # sanity: live read works
    t = read_parts_arrow(out, [live[0]], ["repo"])
    assert t.num_rows > 0
    missing = max(live) + 1000
    with _pytest.raises(ValueError, match="not live"):
        read_parts_arrow(out, [missing], ["repo"])


def test_driver_search_defers_on_compensating_ragged_vectors(spark, tmp_path):
    """r6 (ADVICE): one-short + one-long vectors pass an aggregate
    element-count gate; the per-row offsets gate must defer to the
    Spark path (return None) instead of misaligning the reshape."""
    from fhirflat_spark.encode import encode_table
    from fhirflat_spark.vector_index import _search_driver_side
    from fhirflat_spark.manifest import current_snapshot, snapshot_part_ids

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0]),            # one short
        (2, [0.0, 0.0, 1.0, 1.0]),  # one long — total count compensates
        (3, [1.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = str(tmp_path / "vds")
    encode_table(df, out, rows_per_bucket=10)
    parts = sorted(snapshot_part_ids(out, current_snapshot(out)))
    got = _search_driver_side(
        spark, out, parts, "vec_id", "embedding",
        [1.0, 0.0, 0.0], top_k=2, exclude_id=None,
    )
    assert got is None
