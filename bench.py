#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Measures (BASELINE.md targets):
1. headline query latencies at $SPARK_GRAFT_SF_DIR (default sf0.1);
2. encode throughput (GB/s) on the synthetic source-code table at TWO
   parallelism levels — local[N] vs local[4N] (sandbox stand-in for N vs
   4N executors) — and the scaling efficiency between them;
3. compressed footprint vs a parquet/zstd baseline of the same table.

Results are also appended to BENCH/BASELINE.md with the exact configs.
"""

from __future__ import annotations

import json
import os
import shutil
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_LOW = max(CPUS // 4, 1)
BENCH_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "200000"))
WORK = os.environ.get("SPARK_GRAFT_BENCH_WORK", "/tmp/fhirflat_spark_bench")

HEADLINE = [
    "tpch_q1",
    "broadcast_join_revenue",
    "window_top_order",
    "minhash_signatures",
    "token_count",
    "dedup_exact",
    "cosine_score_all",
]


def _sf_label(path: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else 0.0


def run_queries(spark) -> dict[str, float]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out = {}
    for name in HEADLINE:
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        n = df.count()
        out[name] = round(time.time() - t0, 3)
        print(f"  query {name}: {out[name]}s ({n} rows)", flush=True)
    return out


def ensure_source(spark) -> str:
    """Materialize the synthetic code table once (generation excluded from
    encode timing)."""
    src = f"{WORK}/source_{BENCH_ROWS}"
    if not os.path.exists(f"{src}/_SUCCESS"):
        from fhirflat_spark.datagen import gen_spark

        gen_spark(spark, BENCH_ROWS, seed=42, partitions=CPUS * 2).write.mode(
            "overwrite"
        ).parquet(src)
    return src


ROWS_PER_BUCKET = max(BENCH_ROWS // 80, 2000)


def encode_run(cores: int, src: str, tag: str) -> dict:
    """Fresh session at the given core count; warm up (JIT, python workers,
    page cache), then time a full encode."""
    from fhirflat_spark.encode import encode_table
    from fhirflat_spark.session import get_spark

    spark = get_spark(f"bench_encode_{tag}", cores=cores, shuffle_partitions=cores * 2)
    try:
        df = spark.read.parquet(src)
        out = f"{WORK}/enc_{tag}"
        walls = []
        res = None
        for attempt in range(2):  # attempt 0 = warmup, 1 = measured
            shutil.rmtree(out, ignore_errors=True)
            t0 = time.time()
            res = encode_table(df, out, rows_per_bucket=ROWS_PER_BUCKET)
            walls.append(time.time() - t0)
            print(f"  encode[{tag}] attempt{attempt}: {walls[-1]:.1f}s", flush=True)
        wall = min(walls[1:]) if len(walls) > 1 else walls[0]
        return {
            "cores": cores,
            "wall_sec": round(wall, 2),
            "raw_bytes": res.raw_bytes,
            "encoded_bytes": res.encoded_bytes,
            "gbps": round(res.raw_bytes / 1e9 / wall, 4),
            "ratio": round(res.ratio, 4),
            "partitions": res.num_partitions,
        }
    finally:
        spark.stop()


def parquet_zstd_baseline(spark, src: str) -> int:
    out = f"{WORK}/pz_baseline"
    shutil.rmtree(out, ignore_errors=True)
    (
        spark.read.parquet(src)
        .write.option("compression", "zstd")
        .mode("overwrite")
        .parquet(out)
    )
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(out)
        for f in fs
        if f.endswith(".parquet")
    )


def main() -> None:
    from fhirflat_spark.session import get_spark

    os.makedirs(WORK, exist_ok=True)
    t_start = time.time()

    spark = get_spark("bench_queries", cores=CPUS)
    queries = run_queries(spark)
    src = ensure_source(spark)
    pz_bytes = parquet_zstd_baseline(spark, src)
    spark.stop()

    low = encode_run(N_LOW, src, f"n{N_LOW}")
    high = encode_run(CPUS, src, f"n{CPUS}")
    efficiency = round(high["gbps"] / (4 * low["gbps"]), 4) if low["gbps"] else 0.0

    total = round(time.time() - t_start, 2)
    result = {
        "metric": "encode_gbps_at_local32",
        "value": high["gbps"],
        "unit": "GB/s",
        "queries": queries,
        "sf": _sf_label(SF_DIR),
        "encode": {
            f"local[{N_LOW}]": low,
            f"local[{CPUS}]": high,
            "scaling_efficiency_n_to_4n": efficiency,
        },
        "footprint": {
            "raw_bytes": high["raw_bytes"],
            "encoded_bytes": high["encoded_bytes"],
            "parquet_zstd_bytes": pz_bytes,
            "ratio_vs_raw": high["ratio"],
            "ratio_vs_parquet_zstd": round(high["encoded_bytes"] / pz_bytes, 4),
        },
        "bench_total_sec": total,
    }
    _write_report(result)
    print(json.dumps(result), flush=True)


def _write_report(result: dict) -> None:
    os.makedirs("BENCH", exist_ok=True)
    lines = [
        "# BENCH — measured results",
        "",
        f"Generated by bench.py on {time.strftime('%Y-%m-%d %H:%M:%S')} "
        f"(rows={BENCH_ROWS}, sf_dir={SF_DIR}).",
        "",
        "## Encode throughput & scaling (local[N] vs local[4N], same input)",
        "",
        "| config | wall (s) | raw bytes | GB/s | partitions |",
        "|---|---|---|---|---|",
    ]
    for cfg, r in result["encode"].items():
        if isinstance(r, dict):
            lines.append(
                f"| {cfg} | {r['wall_sec']} | {r['raw_bytes']} | {r['gbps']} | {r['partitions']} |"
            )
    eff = result["encode"]["scaling_efficiency_n_to_4n"]
    lines += [
        "",
        f"**Scaling efficiency N→4N = {eff}** (target ≥ 0.8; "
        "efficiency = throughput(4N) / (4 × throughput(N))).",
        "",
        "## Compressed footprint",
        "",
        f"- raw logical bytes: {result['footprint']['raw_bytes']}",
        f"- engine encoded bytes: {result['footprint']['encoded_bytes']} "
        f"({result['footprint']['ratio_vs_raw']}× of raw)",
        f"- parquet/zstd baseline: {result['footprint']['parquet_zstd_bytes']}",
        f"- **engine / parquet-zstd = {result['footprint']['ratio_vs_parquet_zstd']}** "
        "(target ≤ 1.0)",
        "",
        "## Headline query latencies (local[{}], {})".format(CPUS, SF_DIR),
        "",
        "| query | seconds |",
        "|---|---|",
    ]
    for q, s in result["queries"].items():
        lines.append(f"| {q} | {s} |")
    with open("BENCH/BASELINE.md", "w") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
