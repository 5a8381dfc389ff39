"""The named Spark sink (``df.write.format("fhirflat")`` and
``writeStream.format("fhirflat")``): atomic snapshot commits through the
DSv2 writer contract — create/append/overwrite semantics, add-column
evolution, abort atomicity, library interop, and replay-idempotent
streaming micro-batches."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from fhirflat_spark.decode import decode_table
from fhirflat_spark.encode import append_table, encode_table
from fhirflat_spark.manifest import current_snapshot
from fhirflat_spark.sources.datasource import register

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    register(spark)
    return spark.read.parquet(f"{SF}/documents.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _read(spark, path, **opts):
    r = spark.read.format("fhirflat").option("path", path)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_write_roundtrip(spark, docs, tmp_path):
    out = str(tmp_path / "t")
    docs.repartition(3).write.format("fhirflat").mode("append").save(out)
    back = _read(spark, out)
    assert back.schema.fieldNames() == docs.schema.fieldNames()
    assert _rows(back) == _rows(docs)
    # the sink-written table is a first-class engine dataset
    assert _rows(decode_table(spark, out)) == _rows(docs)
    assert current_snapshot(out) == 1


def test_batch_append_evolution(spark, docs, tmp_path):
    out = str(tmp_path / "t")
    docs.repartition(2).write.format("fhirflat").mode("append").save(out)
    delta = (
        docs.limit(50).withColumn("extra", F.lit("x")).drop("lang")
        .repartition(1)
    )
    delta.write.format("fhirflat").mode("append").save(out)
    back = _read(spark, out)
    # added column trails; omitted column null-fills the delta's rows
    assert back.columns == [*docs.columns, "extra"]
    assert back.count() == docs.count() + 50
    assert back.where("extra is not null").count() == 50
    assert back.where("lang is null").count() == 50
    # old partitions read typed nulls for the added column
    assert back.where("extra is null").count() == docs.count()


def test_batch_append_type_mismatch_rejected(spark, docs, tmp_path):
    out = str(tmp_path / "t")
    docs.repartition(1).write.format("fhirflat").mode("append").save(out)
    bad = docs.withColumn("n_chars", F.col("n_chars").cast("string"))
    with pytest.raises(Exception, match="type"):
        bad.repartition(1).write.format("fhirflat").mode("append").save(out)


def test_overwrite_same_schema_keeps_history(spark, docs, tmp_path):
    out = str(tmp_path / "t")
    docs.repartition(2).write.format("fhirflat").mode("append").save(out)
    small = docs.limit(100).cache()
    small.repartition(1).write.format("fhirflat").mode("overwrite").save(out)
    assert current_snapshot(out) == 2
    assert _read(spark, out).count() == 100
    # REPLACE commit: the pre-overwrite snapshot stays time-travelable
    assert _read(spark, out, snapshot="1").count() == docs.count()


def test_overwrite_new_schema_clears_history(spark, docs, tmp_path):
    out = str(tmp_path / "t")
    docs.repartition(2).write.format("fhirflat").mode("append").save(out)
    two = docs.select("doc_id", "text")
    two.repartition(1).write.format("fhirflat").mode("overwrite").save(out)
    # one schema per table: incompatible overwrite restarts the log
    assert current_snapshot(out) == 1
    back = _read(spark, out)
    assert back.columns == ["doc_id", "text"]
    assert _rows(back) == _rows(two)


def test_failed_write_leaves_table_untouched(spark, docs, tmp_path):
    out = str(tmp_path / "t")
    docs.repartition(2).write.format("fhirflat").mode("append").save(out)

    @F.udf(StringType())
    def boom(x):
        raise RuntimeError("poison")

    bad = docs.limit(50).withColumn("text", boom("text")).repartition(2)
    with pytest.raises(Exception):
        bad.write.format("fhirflat").mode("append").save(out)
    # manifest, snapshot log, and data all unchanged; no orphan part dirs
    assert current_snapshot(out) == 1
    assert _read(spark, out).count() == docs.count()
    assert sorted(os.listdir(f"{out}/chunks")) == ["part_id=0", "part_id=1"]


def test_library_interop_both_directions(spark, docs, tmp_path):
    # sink-created table accepts a library append...
    out = str(tmp_path / "a")
    first = docs.where("doc_id < 250").cache()
    rest = docs.where("doc_id >= 250").cache()
    first.repartition(2).write.format("fhirflat").mode("append").save(out)
    append_table(rest, out, rows_per_bucket=100)
    assert _rows(decode_table(spark, out)) == _rows(docs)
    # ...and a library table accepts a sink append
    out2 = str(tmp_path / "b")
    encode_table(first, out2, rows_per_bucket=100)
    rest.repartition(2).write.format("fhirflat").mode("append").save(out2)
    assert _rows(_read(spark, out2)) == _rows(docs)


def test_write_bloom_option_enables_point_lookup(spark, docs, tmp_path):
    out = str(tmp_path / "t")
    (docs.repartition(2).write.format("fhirflat").mode("append")
     .option("bloom_columns", "text").save(out))
    probe = docs.where("doc_id = 7").select("text").first()[0]
    got = decode_table(spark, out, point_filter=("text", probe))
    assert got.where(F.col("text") == probe).count() >= 1


def test_empty_partitions_are_not_committed(spark, docs, tmp_path):
    out = str(tmp_path / "t")
    # 8 partitions, 5 rows: most tasks see zero rows and must not leave
    # empty part dirs or fragments behind
    docs.limit(5).repartition(8).write.format("fhirflat").mode(
        "append").save(out)
    assert _read(spark, out).count() == 5
    from fhirflat_spark import fsio

    for d in fsio.list_dirs(f"{out}/chunks"):
        assert fsio.list_files(f"{out}/chunks/{d}", suffix=".parquet")


def test_create_ignores_stale_crashed_state(spark, docs, tmp_path):
    out = str(tmp_path / "t")
    docs.repartition(2).write.format("fhirflat").mode("append").save(out)
    # simulate a crashed prior job: fragments + chunks on disk, but no
    # summary/manifest — the dir plans as "create" and must own the table
    os.remove(f"{out}/_SUMMARY.json")
    shutil.rmtree(f"{out}/manifest")
    small = docs.limit(10).cache()
    small.repartition(1).write.format("fhirflat").mode("append").save(out)
    back = _read(spark, out)
    assert _rows(back) == _rows(small)
    assert current_snapshot(out) == 1


def test_batch_upsert_merge(spark, docs, tmp_path):
    out = str(tmp_path / "t")
    docs.repartition(2).write.format("fhirflat").mode("append").save(out)
    upd = docs.where("doc_id < 50").withColumn(
        "text", F.concat(F.col("text"), F.lit("!"))
    )
    ins = docs.where("doc_id >= 50 AND doc_id < 60").withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    delta = upd.unionByName(ins).cache()
    (delta.repartition(2).write.format("fhirflat").mode("append")
     .option("upsert_key", "doc_id").save(out))
    # matched keys read the delta's version, unmatched inserted, rest kept
    expected = docs.where("doc_id >= 50").unionByName(delta)
    back = _read(spark, out)
    assert _rows(back) == _rows(expected)
    # the upsert is ONE commit, visible identically to the library reader
    assert current_snapshot(out) == 2
    assert _rows(decode_table(spark, out)) == _rows(expected)
    # pre-upsert snapshot still reads the original values
    old = _read(spark, out, snapshot="1")
    assert _rows(old) == _rows(docs)


def test_batch_upsert_into_fresh_table_is_insert(spark, docs, tmp_path):
    out = str(tmp_path / "t")
    (docs.repartition(2).write.format("fhirflat").mode("append")
     .option("upsert_key", "doc_id").save(out))
    assert _rows(_read(spark, out)) == _rows(docs)
    # no delete entry was published for the create commit
    from fhirflat_spark.manifest import active_delete_files

    assert active_delete_files(out) == []


def test_upsert_key_validation(spark, docs, tmp_path):
    out = str(tmp_path / "t")
    docs.repartition(1).write.format("fhirflat").mode("append").save(out)
    with pytest.raises(Exception, match="upsert_key"):
        (docs.limit(5).repartition(1).write.format("fhirflat")
         .mode("append").option("upsert_key", "nope").save(out))
    with pytest.raises(Exception, match="overwrite"):
        (docs.limit(5).repartition(1).write.format("fhirflat")
         .mode("overwrite").option("upsert_key", "doc_id").save(out))


def _land(frame, src, tag, parts):
    tmp = f"{src}_tmp_{tag}"
    shutil.rmtree(tmp, ignore_errors=True)
    frame.repartition(parts).write.parquet(tmp)
    os.makedirs(src, exist_ok=True)
    for i, f in enumerate(sorted(glob.glob(f"{tmp}/*.parquet"))):
        shutil.copy(f, f"{src}/{tag}{i}.parquet")
    shutil.rmtree(tmp)


def test_stream_sink_two_batches(spark, docs, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    first = docs.limit(200).cache()
    rest = docs.subtract(first).cache()
    os.makedirs(src, exist_ok=True)
    sdf = spark.readStream.schema(docs.schema).parquet(src)

    def run():
        q = (
            sdf.writeStream.format("fhirflat")
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start(out)
        )
        q.awaitTermination(180)
        assert q.exception() is None

    _land(first, src, "a", 2)
    run()
    assert current_snapshot(out) == 1
    _land(rest, src, "b", 3)
    run()
    assert current_snapshot(out) == 2
    back = _read(spark, out)
    assert _rows(back) == _rows(docs)
    # micro-batch part-id namespace: batch b owns [b*ppb, (b+1)*ppb)
    from fhirflat_spark.sources.writer import PARTS_PER_BATCH as PPB

    pids = sorted(
        int(d.split("=")[1]) for d in os.listdir(f"{out}/chunks")
    )
    assert all(p < PPB for p in pids[:2])
    assert all(PPB <= p < 2 * PPB for p in pids[2:])
    # no staged leftovers after the commits
    assert not os.path.exists(f"{out}/chunks_staging") or not os.listdir(
        f"{out}/chunks_staging"
    )
    # the stream-written table tails back out through the CDC source
    cdc = spark.readStream.format("fhirflat").option("path", out).load()
    q = (
        cdc.writeStream.format("memory").queryName("wsink_tail")
        .option("checkpointLocation", str(tmp_path / "cp2"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    assert (
        spark.sql("select count(*) c from wsink_tail").first()["c"]
        == docs.count()
    )


def test_stream_sink_upsert_latest_batch_wins(spark, docs, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    first = docs.where("doc_id < 200").cache()
    upd = (
        first.where("doc_id % 3 = 0")
        .withColumn("text", F.concat(F.col("text"), F.lit("+v2")))
        .cache()
    )
    os.makedirs(src, exist_ok=True)
    sdf = spark.readStream.schema(docs.schema).parquet(src)

    def run():
        q = (
            sdf.writeStream.format("fhirflat")
            .option("checkpointLocation", cp)
            .option("upsert_key", "doc_id")
            .trigger(availableNow=True)
            .start(out)
        )
        q.awaitTermination(180)
        assert q.exception() is None

    _land(first, src, "a", 2)
    run()
    _land(upd, src, "b", 2)
    run()
    # CDC-apply: the later micro-batch's version wins per key
    expected = first.where("doc_id % 3 != 0").unionByName(upd)
    back = _read(spark, out)
    assert back.count() == first.count()
    assert _rows(back) == _rows(expected)
    assert (
        back.where("text like '%+v2'").count()
        == first.where("doc_id % 3 = 0").count()
    )


def test_sink_branch_staging_and_publish(spark, docs, tmp_path):
    """df.write.option("branch", ...) stages through the sink: invisible
    to main until publish_branch fast-forwards."""
    from fhirflat_spark.decode import decode_table
    from fhirflat_spark.encode import encode_table
    from fhirflat_spark.manifest import publish_branch

    out = str(tmp_path / "waps")
    encode_table(docs.where(F.col("doc_id") < 100), out, rows_per_bucket=50)
    (
        docs.where(F.col("doc_id").between(100, 149))
        .write.format("fhirflat").mode("append")
        .option("branch", "audit").save(out)
    )
    assert decode_table(spark, out).count() == 100
    assert decode_table(spark, out, snapshot="audit").count() == 150
    publish_branch(out, "audit")
    assert decode_table(spark, out).count() == 150


def test_sink_branch_guards(spark, docs, tmp_path):
    from fhirflat_spark.encode import encode_table

    out = str(tmp_path / "wapg")
    encode_table(docs.where(F.col("doc_id") < 50), out, rows_per_bucket=50)
    # schema evolution refused on a branch
    with pytest.raises(Exception, match="schema evolution"):
        (
            docs.where(F.col("doc_id") == 50)
            .withColumn("extra", F.lit(1))
            .write.format("fhirflat").mode("append")
            .option("branch", "audit").save(out)
        )
    # staging needs an existing table (create mode refused)
    with pytest.raises(Exception, match="append-only"):
        (
            docs.limit(1).write.format("fhirflat").mode("append")
            .option("branch", "b").save(str(tmp_path / "fresh"))
        )


def test_sink_ndv_option_and_inheritance(spark, docs, tmp_path):
    from fhirflat_spark.ndv import ndv_from_metadata

    out = str(tmp_path / "ndvsink")
    (
        docs.where(F.col("doc_id") < 200)
        .write.format("fhirflat").mode("append")
        .option("ndv_columns", "doc_id,lang").save(out)
    )
    est = ndv_from_metadata(out, "doc_id")
    assert est is not None and abs(est - 200) <= 10
    # append inherits the sketch columns from the summary
    docs.where(F.col("doc_id").between(200, 299)).write.format(
        "fhirflat").mode("append").save(out)
    est2 = ndv_from_metadata(out, "doc_id")
    assert est2 is not None and abs(est2 - 300) <= 15
