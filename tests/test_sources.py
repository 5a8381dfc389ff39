"""Source/sink + dataset-bundle tests (SURVEY §2.1)."""

from __future__ import annotations

import json
import os

from fhirflat_spark.sources import (
    decode_dataset,
    encode_dataset,
    read_csv,
    read_ndjson,
    write_errors,
)


def test_ndjson_roundtrip(spark, tmp_path):
    path = str(tmp_path / "rows.ndjson")
    with open(path, "w") as f:
        for i in range(50):
            f.write(json.dumps({"id": f"r{i}", "value": i * 1.5}) + "\n")
    df = read_ndjson(spark, path, schema="id string, value double")
    assert df.count() == 50
    assert df.schema.simpleString() == "struct<id:string,value:double>"


def test_csv_source_and_error_sink(spark, tmp_path):
    path = str(tmp_path / "raw.csv")
    with open(path, "w") as f:
        f.write("subjid,outcome\ns1,1\ns2,bad\n")
    df = read_csv(spark, path)
    assert df.count() == 2
    errs = df.where("outcome = 'bad'")
    err_dir = str(tmp_path / "errors")
    write_errors(errs, err_dir)
    files = [x for x in os.listdir(err_dir) if x.endswith(".csv")]
    assert files


def test_dataset_bundle_roundtrip(spark, tmp_path):
    sf = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")
    tables = {
        "nation": spark.read.parquet(f"{sf}/nation.parquet"),
        "region": spark.read.parquet(f"{sf}/region.parquet"),
    }
    out = str(tmp_path / "bundle")
    bundle = encode_dataset(tables, out, rows_per_bucket=100)
    assert bundle["n_tables"] == 2
    assert len(bundle["bundle_sha256"]) == 64
    decoded = decode_dataset(spark, out)
    for name, df in tables.items():
        back = decoded[name]
        assert back.schema == df.schema
        assert back.exceptAll(df).count() + df.exceptAll(back).count() == 0
