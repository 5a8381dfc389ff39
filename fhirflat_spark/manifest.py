"""Per-partition encode manifest + dataset summary — the lineage layer.

The analog of the reference's dataset bundle metadata: ``fhirflat.toml``
(row count, generator version, checksum-of-checksums) + ``sha256sums.txt``
(per-file sha256), reference fhirflat/ingest.py:381-432. Here the unit of
lineage is the *partition*: codec choices, sizes, row counts, and a
content checksum per partition, all queryable as a parquet table — which
is what makes encode runs checkpoint-resumable (skip partitions whose
manifest row says ``ok``, re-encode the rest).

Scale note: manifest cardinality is #partitions (+#chunks while being
aggregated) — input_rows/8192 chunks, so ~1/10^4 of the data. It is
aggregated driver-side from a column-pruned scan of the chunk files
(payload blobs never read); a run large enough for that to matter
(≳10^7 partitions) should flip ``build_manifest`` — the distributed
DataFrame variant kept below — into the write path instead.
"""

from __future__ import annotations

import hashlib
import json
from collections import defaultdict

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_VERSION = 2  # v2: payload = struct<__c{i}: binary> (was map<string,binary>)

# Dataset layout epoch — bump whenever codec selection, chunking, bucket
# placement, or hashing changes the bytes a given input encodes to (the
# same changes that re-pin tests/golden_manifest_sha.txt). Cache layers
# key on this so a format change can never silently reuse stale data.
FORMAT_VERSION = 4  # v4: kernel rebatcher — chunk geometry independent of
#     source row-group layout; fsst tile-pair format (round 4)

MANIFEST_ARROW_SCHEMA = pa.schema(
    [
        ("part_id", pa.int32()),
        ("n_chunks", pa.int32()),
        ("rows", pa.int64()),
        ("raw_bytes", pa.int64()),
        ("encoded_bytes", pa.int64()),
        ("partition_sha", pa.string()),
        ("repo_min", pa.string()),
        ("repo_max", pa.string()),
        ("status", pa.string()),
    ]
)


def _local(path: str) -> str:
    return path[len("file:"):] if path.startswith("file:") else path


def load_fragments(frag_dir: str) -> list[dict]:
    """Merge task-committed manifest fragments (one json per partition).

    Local-path I/O; a real object-store deployment would glob via
    ``pyarrow.fs`` — the fragment protocol itself (task writes
    ``<part_id>.json`` atomically, driver merges) is scheme-agnostic.
    """
    import glob
    import os

    rows: list[dict] = []
    if not os.path.isdir(frag_dir):
        return rows
    for path in sorted(glob.glob(f"{frag_dir}/*.json")):
        with open(path) as f:
            rows.extend(json.load(f))
    return rows


def write_manifest(spark: SparkSession, out_dir: str, meta_rows: list) -> dict:
    """Aggregate collected chunk-meta rows → manifest parquet + stats.

    Partition checksum = sha256 over that partition's chunk checksums in
    chunk order; dataset checksum = sha256 over partition checksums in
    part_id order (the checksum-of-checksums pattern of the reference's
    ``sha256sums.txt`` + ``fhirflat.toml``).
    """
    by_part: dict[int, list] = defaultdict(list)
    for r in meta_rows:
        by_part[r["part_id"]].append(r)
    cols: dict[str, list] = defaultdict(list)
    totals = {"rows": 0, "raw_bytes": 0, "encoded_bytes": 0}
    dataset_h = hashlib.sha256()
    for part_id in sorted(by_part):
        chunks = sorted(by_part[part_id], key=lambda r: r["chunk_seq"])
        h = hashlib.sha256()
        rows = raw = enc = 0
        rmin = rmax = None
        for c in chunks:
            h.update(c["content_sha"].encode())
            rows += c["n_rows"]
            raw += c["raw_bytes"]
            enc += c["encoded_bytes"]
            if c["repo_min"] is not None:
                rmin = c["repo_min"] if rmin is None else min(rmin, c["repo_min"])
            if c["repo_max"] is not None:
                rmax = c["repo_max"] if rmax is None else max(rmax, c["repo_max"])
        psha = h.hexdigest()
        dataset_h.update(psha.encode())
        cols["part_id"].append(part_id)
        cols["n_chunks"].append(len(chunks))
        cols["rows"].append(rows)
        cols["raw_bytes"].append(raw)
        cols["encoded_bytes"].append(enc)
        cols["partition_sha"].append(psha)
        cols["repo_min"].append(rmin)
        cols["repo_max"].append(rmax)
        cols["status"].append("ok")
        totals["rows"] += rows
        totals["raw_bytes"] += raw
        totals["encoded_bytes"] += enc
    table = pa.table(
        {f.name: pa.array(cols[f.name], f.type) for f in MANIFEST_ARROW_SCHEMA}
    )
    import os

    os.makedirs(_local(out_dir) + "/manifest", exist_ok=True)
    pq.write_table(table, _local(out_dir) + "/manifest/manifest.parquet")
    return {**totals, "dataset_sha256": dataset_h.hexdigest(), "n_partitions": len(by_part)}


def build_manifest(chunk_df: DataFrame) -> DataFrame:
    """Distributed manifest aggregation (for runs whose manifest itself is
    big data); same schema/semantics as the driver-side path."""
    return (
        chunk_df.groupBy("part_id")
        .agg(
            F.count("*").cast("int").alias("n_chunks"),
            F.sum("n_rows").alias("rows"),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("encoded_bytes").alias("encoded_bytes"),
            F.sha2(
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("chunk_seq", "content_sha"))
                        ),
                        lambda s: s["content_sha"],
                    ),
                ),
                256,
            ).alias("partition_sha"),
            F.min("repo_min").alias("repo_min"),
            F.max("repo_max").alias("repo_max"),
            F.lit("ok").alias("status"),
        )
    )


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(f"{out_dir}/manifest")


CHUNK_STATS_SCHEMA = (
    "map<string, struct<codec: string, raw: bigint, enc: bigint,"
    " sha: string, zmin: string, zmax: string>>"
)


def read_chunk_stats(spark: SparkSession, out_dir: str) -> DataFrame:
    """Per-(chunk, column) lineage as a queryable DataFrame: codec choice,
    raw/encoded bytes, content sha, and zone-map span for every chunk of
    every column — the flattened view of the per-chunk ``stats`` JSON the
    encode kernel records (the Iceberg manifest-file analog).

    Reads ONLY the metadata columns of the chunk files (payload blobs are
    pruned by the nested-column projection), so cost is #chunks, not data
    size. Zone bounds come back as strings (numeric columns stringify);
    cast at the call site for numeric min/max semantics."""
    return (
        spark.read.parquet(f"{out_dir}/chunks")
        .select(
            "part_id",
            "chunk_seq",
            "n_rows",
            F.explode(F.from_json("stats", CHUNK_STATS_SCHEMA)).alias(
                "column", "st"
            ),
        )
        .select(
            "part_id",
            "chunk_seq",
            "n_rows",
            "column",
            F.col("st.codec").alias("codec"),
            F.col("st.raw").alias("raw_bytes"),
            F.col("st.enc").alias("encoded_bytes"),
            F.col("st.zmin").alias("zmin"),
            F.col("st.zmax").alias("zmax"),
        )
    )


def completed_partitions(spark: SparkSession, out_dir: str) -> frozenset[int]:
    """Partitions already encoded + recorded ok — the resume skip set."""
    import os

    if not os.path.exists(_local(out_dir) + "/manifest"):
        return frozenset()
    try:
        t = pq.read_table(_local(out_dir) + "/manifest", columns=["part_id", "status"])
    except Exception:
        return frozenset()
    return frozenset(
        int(p) for p, s in zip(t["part_id"].to_pylist(), t["status"].to_pylist())
        if s == "ok"
    )


def dataset_checksum(manifest: DataFrame) -> str:
    """Checksum-of-checksums over partitions ordered by part_id."""
    rows = manifest.select("part_id", "partition_sha").collect()
    h = hashlib.sha256()
    for r in sorted(rows, key=lambda r: r["part_id"]):
        h.update(r["partition_sha"].encode())
    return h.hexdigest()


def write_summary(spark: SparkSession, out_dir: str, result, columns: list[str],
                  spark_schema: str | None = None,
                  dataset_sha: str | None = None) -> dict:
    from fhirflat_spark import __version__

    summary = {
        "engine": "fhirflat_spark",
        "version": __version__,
        "manifest_version": MANIFEST_VERSION,
        "format_version": FORMAT_VERSION,
        "columns": columns,
        "spark_schema": spark_schema,
        "rows": result.rows,
        "raw_bytes": result.raw_bytes,
        "encoded_bytes": result.encoded_bytes,
        "compression_ratio": round(result.ratio, 6),
        "num_partitions": result.num_partitions,
        "dataset_sha256": dataset_sha,
    }
    # driver-side metadata file; on an object store this would go through
    # the hadoop FS API — local path I/O suffices for this sandbox
    with open(_local(out_dir) + "/_SUMMARY.json", "w") as f:
        json.dump(summary, f, indent=2)
    return summary


def read_summary(spark: SparkSession, out_dir: str) -> dict:
    with open(_local(out_dir) + "/_SUMMARY.json") as f:
        return json.load(f)


# --- maintained table statistics (the Iceberg partition-stats pattern):
# the per-key row counts the salted planner used, persisted so whole-
# table totals stay queryable without a rescan (appends still count
# their own delta for placement — merged totals would over-fragment
# small appends; a caller doing a full re-encode can feed the merged
# counts back in as key_counts to skip the scan). Stored as one FRAGMENT per
# part-offset range (mirroring the manifest-fragment protocol): a
# replayed append/streaming batch atomically REPLACES its own fragment
# instead of re-merging into a single file, so stats stay idempotent
# under retries. Stale counts are safe by design — placement keeps a
# fallback bucket for unseen keys.

def _stats_dir(out_dir: str) -> str:
    return _local(out_dir) + "/stats/key_count_parts"


def write_key_counts(out_dir: str, sentinel_counts: list[tuple],
                     label: str = "000000000000",
                     fresh: bool = False) -> None:
    """Persist sentinel-keyed counts ("v:<k>" / "n:" / "o:") as a
    raw-keyed stats fragment named by ``label`` (tmp+rename — a retry of
    the same label replaces, never duplicates). ``fresh=True`` clears
    all fragments first (a full re-encode owns the whole table). The
    "o:" fallback pseudo-key is not a real key and is dropped."""
    import os
    import shutil

    d = _stats_dir(out_dir)
    if fresh:
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d, exist_ok=True)
    rows: dict[str | None, int] = {}
    for sk, c in sentinel_counts:
        if sk == "o:":
            continue
        k = None if sk == "n:" else sk[2:]
        rows[k] = rows.get(k, 0) + int(c)
    table = pa.table(
        {
            "key": pa.array(list(rows.keys()), pa.string()),
            "count": pa.array(list(rows.values()), pa.int64()),
        }
    )
    tmp = f"{d}/.{label}.parquet.tmp.{os.getpid()}"
    pq.write_table(table, tmp)
    os.replace(tmp, f"{d}/{label}.parquet")


def load_key_counts(out_dir: str) -> list[tuple] | None:
    """Merged per-key counts across every stats fragment, as caller-style
    ``key_counts`` (raw key or None, count) — pass straight back into
    ``encode_table``/``plan_salted``. None when no stats exist."""
    import glob
    import os

    d = _stats_dir(out_dir)
    if not os.path.isdir(d):
        return None
    totals: dict[str | None, int] = {}
    found = False
    for path in sorted(glob.glob(f"{d}/*.parquet")):
        found = True
        t = pq.read_table(path)
        for k, c in zip(t["key"].to_pylist(), t["count"].to_pylist()):
            totals[k] = totals.get(k, 0) + int(c)
    return list(totals.items()) if found else None
