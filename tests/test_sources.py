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


def test_url_csv_source(spark, tmp_path):
    """S5: the URL CSV source (reference Google-Sheets mapping fetch) —
    exercised through a file:// URL (no network in the sandbox; the
    urllib path is identical for http/https)."""
    from fhirflat_spark.sources import read_url_csv, sheet_url

    path = str(tmp_path / "mapping.csv")
    with open(path, "w") as f:
        f.write("raw_variable,raw_response,target\nage,*,subject.age\n"
                "sex,1,subject.gender=male\n")
    df = read_url_csv(spark, f"file://{path}")
    rows = {(r["raw_variable"], r["target"]) for r in df.collect()}
    assert ("age", "subject.age") in rows
    assert df.count() == 2
    # URL builder mirrors the reference's export format
    assert sheet_url("abc123") == (
        "https://docs.google.com/spreadsheets/d/abc123/export?format=csv"
    )
    assert sheet_url("abc123", 7).endswith("&gid=7")


def test_archive_sink_roundtrip(spark, tmp_path):
    """S9: archive an encoded output dir to one zip, unpack, decode —
    bit-identical."""
    from fhirflat_spark.datagen import gen_spark
    from fhirflat_spark.decode import decode_table, verify_against_source
    from fhirflat_spark.encode import encode_table
    from fhirflat_spark.sources import archive_output, unarchive_input

    out = str(tmp_path / "ds")
    df = gen_spark(spark, 800, seed=21)
    encode_table(df, out, rows_per_bucket=200)
    zip_path = archive_output(out, "zip", remove_source=True)
    assert zip_path.endswith(".zip") and os.path.exists(zip_path)
    assert not os.path.exists(out)  # remove_source honored
    restored = unarchive_input(zip_path, str(tmp_path / "restored"))
    dec = decode_table(spark, restored)
    assert dec.count() == 800
    fails = verify_against_source(df, dec, ["repo", "path", "commit"])
    assert fails.count() == 0
