"""Distributed columnar encode: DataFrame → per-partition compressed chunk
table + manifest.

Spark-first shape (SURVEY.md §7 M3):

1. **Skew plan**: per-repo row counts → bucket counts (a giant repo gets
   many buckets) → broadcast join → ``salt`` column. This is explicit
   salted repartitioning on ``repo`` — the cluster-scale analog of the
   reference's joblib fan-out over resource types
   (reference fhirflat/ingest.py:582-594), except skew-aware.
2. ``repartition(P, repo, salt)`` then ``sortWithinPartitions(repo, path,
   commit)`` so front-coding/RLE see sorted path prefixes.
3. ``mapInArrow`` encode kernel: each Arrow batch becomes one *chunk row*
   — a map of column → serialized codec blob, plus stats and a
   content checksum (sha256 of the concatenated raw column bytes, which
   is equivalent to per-row equality without per-row hashing).
4. Chunk rows written as parquet (uncompressed — payloads are already
   compressed); a **manifest** table + dataset summary records lineage
   (the ``fhirflat.toml`` + ``sha256sums.txt`` analog, reference
   fhirflat/ingest.py:381-432) and drives checkpoint resume.

At 100 TB the only shuffle is the single salted repartition, sized so each
partition holds ~``rows_per_bucket`` rows; the per-repo count aggregation
is map-side-combined and tiny (#repos ≪ #rows). Everything after the
shuffle is embarrassingly parallel.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import time
from dataclasses import dataclass

import pyarrow as pa
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fhirflat_spark.codecs import encode_array
from fhirflat_spark.codecs.core import string_parts

def chunk_schema(n_cols: int) -> T.StructType:
    """Chunk-table schema. The payload is a STRUCT with one binary field
    per encoded column (positional ``__c{i}`` names — summary["columns"]
    maps them back) rather than a map<string,binary>: parquet nested-
    schema pruning then skips unselected columns' bytes at IO time, so a
    single-column decode of a 100-TB dataset reads ~1/n_cols of it."""
    # payload fields are NULLABLE: a chunk written before a column was
    # added (schema evolution) has no bytes for it — readers fill typed
    # nulls, transcode carries the absence through
    payload = T.StructType(
        [T.StructField(f"__c{i}", T.BinaryType(), True) for i in range(n_cols)]
    )
    return T.StructType(
        [
            T.StructField("part_id", T.IntegerType(), False),
            T.StructField("chunk_seq", T.IntegerType(), False),
            T.StructField("n_rows", T.LongType(), False),
            T.StructField("payload", payload, False),
            T.StructField("stats", T.StringType(), False),
            T.StructField("content_sha", T.StringType(), False),
            T.StructField("raw_bytes", T.LongType(), False),
            T.StructField("encoded_bytes", T.LongType(), False),
            T.StructField("repo_min", T.StringType(), True),
            T.StructField("repo_max", T.StringType(), True),
        ]
    )


def _col_raw_sha(arr: pa.Array) -> tuple[str, int]:
    """sha256 + byte count of a column's raw value stream.

    Equality of this digest is equivalent to bit-identical per-row equality
    for the chunk (validity + lengths delimit rows), with ONE hash call per
    column per chunk instead of one per row. Three regimes:

    - string/binary: validity bitmap (NULL vs '' must differ) + lengths +
      concatenated value bytes;
    - fixed-width primitives (ints/floats/bools/temporals): validity +
      the contiguous numpy value buffer;
    - everything else (list/struct/map/decimal — numpy would give an
      OBJECT array whose ``tobytes()`` is PyObject pointers, i.e.
      nondeterministic): the Arrow IPC serialization, which is a
      deterministic function of the logical values.
    """
    h = hashlib.sha256()
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t) or pa.types.is_large_binary(t):
        if arr.null_count > 0:
            h.update(arr.is_null().to_numpy(zero_copy_only=False).tobytes())
        lengths, data = string_parts(arr)
        h.update(lengths.tobytes())
        h.update(data)
        nbytes = len(data) + 0  # value bytes only; offsets counted as raw overhead below
        return h.hexdigest(), nbytes + lengths.nbytes
    import numpy as np

    nbytes_logical = int(arr.nbytes)
    if arr.null_count > 0:
        h.update(arr.is_null().to_numpy(zero_copy_only=False).tobytes())
        arr = arr.drop_null()
    try:
        buf = arr.to_numpy(zero_copy_only=False)
    except Exception:
        buf = None
    if buf is None or buf.dtype == np.object_:
        from fhirflat_spark.codecs.kernels import ipc_bytes

        h.update(ipc_bytes(arr))
        return h.hexdigest(), nbytes_logical
    raw = np.ascontiguousarray(buf).tobytes()
    h.update(raw)
    return h.hexdigest(), len(raw)


_ZONE_PREFIX = 64


def _zone_bounds(arr: pa.Array):
    """(min, max) zone bounds for orderable column types, or None.

    String bounds are truncated parquet-style: the min prefix is a valid
    lower bound as-is; the max prefix is made a valid UPPER bound by
    incrementing its last incrementable character (a plain prefix would
    under-approximate and cause wrong pruning). Content-sized strings
    therefore cost ≤128 chars of stats, not whole documents."""
    import pyarrow.compute as pc

    t = arr.type
    if arr.null_count == len(arr):
        return None
    if (pa.types.is_timestamp(t) and t.tz is None) or \
            pa.types.is_date32(t):
        # NTZ timestamps / dates zone as epoch INTEGERS (micros / days
        # — date64 would be millis, a third unit, so it stays zoneless)
        # — JSON-safe and engine-neutral. tz-AWARE timestamps get no
        # zone: their wall-clock reading is session state, and a
        # session-tz literal compared against storage micros would
        # prune wrongly.
        if pa.types.is_timestamp(t):
            if t.unit not in ("s", "ms", "us"):
                return None  # ns→us truncates: no exact micros zone
            if t.unit != "us":
                arr = arr.cast(pa.timestamp("us"))
            mm = pc.min_max(arr.cast(pa.int64()))
        else:
            mm = pc.min_max(arr.cast(pa.int32()))
        return mm["min"].as_py(), mm["max"].as_py()
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        if pa.types.is_floating(t):
            # ANY non-finite value poisons the zone: Arrow's min_max
            # IGNORES NaN, but Spark orders NaN above every value — a
            # finite upper bound would let `col > hi` prune a chunk
            # whose NaN rows match (silent row drop). inf/-inf would
            # also render as non-JSON tokens. Skip the zone entirely.
            if not pc.all(pc.is_finite(arr)).as_py():
                return None
        mm = pc.min_max(arr)
        return mm["min"].as_py(), mm["max"].as_py()
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        mm = pc.min_max(arr)
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        lo_t = lo[:_ZONE_PREFIX]
        if len(hi) > _ZONE_PREFIX:
            p = hi[:_ZONE_PREFIX]
            for i in range(len(p) - 1, -1, -1):
                c = ord(p[i]) + 1
                if 0xD800 <= c <= 0xDFFF:
                    c = 0xE000  # skip the surrogate gap (not JSON-safe)
                if c <= 0x10FFFF:
                    hi_t = p[:i] + chr(c)
                    break
            else:
                return None
        else:
            hi_t = hi
        return lo_t, hi_t
    return None


def _encode_one_batch(batch: pa.RecordBatch, part_id: int, seq: int,
                      columns: list[str], name_map: dict[str, str],
                      overrides: dict, base_opts: dict,
                      repo_batch_col: str | None,
                      bloom_cols: frozenset[str] | None = None,
                      ndv_cols: frozenset[str] | None = None,
                      qsk_cols: frozenset[str] | None = None):
    """Encode ONE Arrow batch into a (fragment-meta, chunk-row batch) pair.

    Shared by the legacy row-shuffle kernel and the blob-shuffle unpack
    kernel so both paths produce byte-identical chunk rows for the same
    input batch."""
    n = batch.num_rows
    payload = {}
    stats = {}
    raw_total = 0
    enc_total = 0
    sha_all = hashlib.sha256()
    for name in columns:
        out_name = name_map[name]
        arr = batch.column(name)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        blob = encode_array(
            arr, codec=overrides.get(out_name, "auto"),
            opts=dict(base_opts) if base_opts else None,
        )
        sha, raw_bytes = _col_raw_sha(arr)
        sha_all.update(sha.encode())
        payload[out_name] = blob
        from fhirflat_spark.codecs.core import unpack_chunk

        codec_name = unpack_chunk(blob)[0]
        stats[out_name] = {
            "codec": codec_name,
            "raw": raw_bytes,
            "enc": len(blob),
            "sha": sha,
        }
        zones = _zone_bounds(arr)
        if zones is not None:
            stats[out_name]["zmin"], stats[out_name]["zmax"] = zones
        # stats v2: per-column null count (all types) + exact value sum
        # (integer types — order-independent, so partition/table rollups
        # are exact; float sums drift and are deliberately not tracked)
        stats[out_name]["nulls"] = arr.null_count
        if pa.types.is_integer(arr.type):
            import pyarrow.compute as pc

            s = pc.sum(arr).as_py()
            stats[out_name]["sum"] = int(s) if s is not None else 0
        if bloom_cols and out_name in bloom_cols:
            from fhirflat_spark import bloom as _bloom

            bh = _bloom.bloom_hex(arr)
            if bh is not None:
                stats[out_name]["bloom"] = bh
                stats[out_name]["bbits"] = _bloom.M_BITS
        if ndv_cols and out_name in ndv_cols:
            from fhirflat_spark import ndv as _ndv

            regs = _ndv.hll_registers(arr)
            if regs is not None:  # all-null chunk contributes no values
                stats[out_name]["hll"] = regs.hex()
        if qsk_cols and out_name in qsk_cols:
            from fhirflat_spark import quantiles as _q

            sk = _q.ddq_sketch(arr)
            if sk is not None:  # all-null contributes nothing; NaN/inf
                stats[out_name]["ddq"] = sk  # poisoning also omits (nulls
                # cross-check refuses service rather than lying)
        raw_total += raw_bytes
        enc_total += len(blob)
    repo_col = (
        batch.column(repo_batch_col)
        if repo_batch_col in batch.schema.names
        else None
    ) if repo_batch_col else None
    rmin = rmax = None
    if repo_col is not None and n:
        import pyarrow.compute as pc

        mm = pc.min_max(repo_col)
        rmin, rmax = mm["min"].as_py(), mm["max"].as_py()
    meta = {
        "part_id": part_id,
        "chunk_seq": seq,
        "n_rows": n,
        "raw_bytes": raw_total,
        "encoded_bytes": enc_total,
        "content_sha": sha_all.hexdigest(),
        "repo_min": rmin,
        "repo_max": rmax,
        # per-column bounds for the manifest's partition-level zones
        # (write_manifest merges; a column missing from ANY chunk stays
        # unbounded at the partition level)
        "zones": {
            name: [stats[name]["zmin"], stats[name]["zmax"]]
            for name in stats
            if "zmin" in stats[name]
        },
        # stats v2 rollup inputs (write_manifest merges per partition;
        # a column absent from a chunk's nulls map = all-null there)
        "nulls": {name: stats[name]["nulls"] for name in stats},
        "sums": {
            name: stats[name]["sum"] for name in stats
            if "sum" in stats[name]
        },
    }
    if ndv_cols:
        meta["hlls"] = {
            name: stats[name]["hll"] for name in stats
            if "hll" in stats[name]
        }
    if qsk_cols:
        meta["ddqs"] = {
            name: stats[name]["ddq"] for name in stats
            if "ddq" in stats[name]
        }
    payload_type = pa.struct(
        [(f"__c{i}", pa.binary()) for i in range(len(columns))]
    )
    out = pa.RecordBatch.from_pydict(
        {
            "part_id": [part_id],
            "chunk_seq": [seq],
            "n_rows": [n],
            "payload": [
                {f"__c{i}": payload[name_map[c]] for i, c in enumerate(columns)}
            ],
            "stats": [json.dumps(stats, separators=(",", ":"))],
            "content_sha": [sha_all.hexdigest()],
            "raw_bytes": [raw_total],
            "encoded_bytes": [enc_total],
            "repo_min": [rmin],
            "repo_max": [rmax],
        },
        schema=pa.schema(
            [
                ("part_id", pa.int32()),
                ("chunk_seq", pa.int32()),
                ("n_rows", pa.int64()),
                ("payload", payload_type),
                ("stats", pa.string()),
                ("content_sha", pa.string()),
                ("raw_bytes", pa.int64()),
                ("encoded_bytes", pa.int64()),
                ("repo_min", pa.string()),
                ("repo_max", pa.string()),
            ]
        ),
    )
    return meta, out


def _write_fragment(manifest_dir: str | None, part_id: int, frag: list[dict]):
    """Task-commit metadata (the Iceberg-manifest pattern): each task
    durably records its own chunk inventory; the driver merges fragments
    with a listing instead of a second Spark job over chunks. The
    atomic publish (tmp+rename locally, single put on an object store —
    fsio) keeps retried/speculative tasks idempotent."""
    if manifest_dir is None or not frag:
        return
    import json as _json
    import os as _os

    from fhirflat_spark import fsio as _fsio

    _fsio.write_bytes_atomic(f"{manifest_dir}/{part_id:06d}.json",
                             _json.dumps(frag).encode(),
                             token=str(_os.getpid()))


def _rebatch(batches, target: int):
    """Re-slice an incoming Arrow batch stream to ``target``-row chunks.

    Chunk geometry must be a pure function of partition row ORDER, not of
    the source's physical layout: reading a parquet file with tiny row
    groups otherwise leaks each row group through as its own tiny chunk,
    paying full per-chunk overhead (codec tables, stats, manifest rows) —
    at 100 TB a ragged upstream writer would silently multiply chunk
    count by orders of magnitude. Streams already arriving at ``target``
    rows (the post-shuffle exchange path, which the golden manifest pins)
    pass through untouched, so this changes nothing where layout is
    already planned."""
    buf: list[pa.RecordBatch] = []
    n = 0
    for b in batches:
        if b.num_rows == 0:
            continue
        if not buf and b.num_rows == target:
            yield b
            continue
        buf.append(b)
        n += b.num_rows
        if n >= target:
            tbl = pa.Table.from_batches(buf)
            off = 0
            while n - off >= target:
                yield tbl.slice(off, target).combine_chunks().to_batches()[0]
                off += target
            rem = tbl.slice(off)
            buf = rem.to_batches() if rem.num_rows else []
            n = rem.num_rows
    if buf:
        yield pa.Table.from_batches(buf).combine_chunks().to_batches()[0]


def encode_kernel_factory(columns: list[str], codec_overrides: dict | None,
                          skip_parts: frozenset[int] | None = None,
                          manifest_dir: str | None = None,
                          name_map: dict[str, str] | None = None,
                          codec_opts: dict | None = None,
                          part_offset: int = 0,
                          bloom_columns: frozenset[str] | None = None,
                          ndv_columns: frozenset[str] | None = None,
                          qsk_columns: frozenset[str] | None = None):
    overrides = codec_overrides or {}
    base_opts = codec_opts or {}
    skip = skip_parts or frozenset()
    name_map = name_map or {c: c for c in columns}
    repo_batch_col = next((b for b, o in name_map.items() if o == "repo"), None)

    def kernel(batches):
        ctx = TaskContext.get()
        part_id = (ctx.partitionId() if ctx is not None else 0) + part_offset
        if part_id in skip:
            return
        from fhirflat_spark.session import ARROW_BATCH_ROWS

        frag: list[dict] = []
        for seq, batch in enumerate(_rebatch(batches, ARROW_BATCH_ROWS)):
            if batch.num_rows == 0:
                continue
            meta, out = _encode_one_batch(
                batch, part_id, seq, columns, name_map, overrides,
                base_opts, repo_batch_col, bloom_columns, ndv_columns,
                qsk_columns,
            )
            frag.append(meta)
            yield out
        _write_fragment(manifest_dir, part_id, frag)

    return kernel


def _murmur3_hash_long(v: int, seed: int = 42) -> int:
    """Spark's Murmur3_x86_32.hashLong (the hash behind HashPartitioning
    of a long column) — public algorithm, reimplemented for driver-side
    partition-placement planning. Returns signed int32."""
    def mix_k1(k1: int) -> int:
        k1 = (k1 * 0xCC9E2D51) & 0xFFFFFFFF
        k1 = ((k1 << 15) | (k1 >> 17)) & 0xFFFFFFFF
        return (k1 * 0x1B873593) & 0xFFFFFFFF

    def mix_h1(h1: int, k1: int) -> int:
        h1 ^= k1
        h1 = ((h1 << 13) | (h1 >> 19)) & 0xFFFFFFFF
        return (h1 * 5 + 0xE6546B64) & 0xFFFFFFFF

    v &= 0xFFFFFFFFFFFFFFFF
    h1 = mix_h1(seed, mix_k1(v & 0xFFFFFFFF))
    h1 = mix_h1(h1, mix_k1((v >> 32) & 0xFFFFFFFF))
    h1 ^= 8
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & 0xFFFFFFFF
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def partition_tokens(P: int) -> list[int]:
    """tokens[t] = a long whose Spark hash-partitioning lands on partition
    t of P. Coupon-collector scan: O(P log P) expected driver time."""
    tokens: list[int | None] = [None] * P
    found = 0
    j = 0
    while found < P:
        t = _murmur3_hash_long(j) % P  # Pmod: non-negative
        if tokens[t] is None:
            tokens[t] = j
            found += 1
        j += 1
    return tokens  # type: ignore[return-value]


def _bq(c: str):  # flat tables may carry dotted names (period.start)
    return F.col(f"`{c}`")


# Driver-side salting-stats ceiling: the placement scan keeps at most this
# many exact per-key entries on the driver; key spaces above it keep the
# heaviest ``cap`` keys exact and fold every other key's rows into the
# "o:" fallback bucket (sized from the measured remainder mass). Bounds
# driver memory at O(cap) instead of O(#distinct keys) — at 10^8 repos the
# uncapped collect was the one driver-memory seam in the encode plan.
# Env-tunable for cluster profiles; the local default sits far above every
# test/bench key space, so sub-cap behavior is bit-identical to the
# uncapped plan (same collect result, same placement).
SALT_STATS_CAP = int(os.environ.get("SPARK_GRAFT_SALT_STATS_CAP", "4096"))


def _salted_prelude(df: DataFrame, rows_per_bucket: int,
                    num_partitions: int | None, salt_col: str | None,
                    key_counts: list[tuple] | None,
                    weight_col: str | None = None):
    """Shared skew-plan prelude: sentinel salt key + driver-side bucket
    allocation. Returns ``None`` when there is no salt column (caller
    falls back to a plain repartition), else a dict with the salted
    frame, the bucket allocation, P, and the ``_with_buckets`` builder.

    Buckets per repo scale with that repo's observed row count, so the one
    giant repo (~40% of rows) spreads over many partitions while small
    repos coalesce. ``xxhash64(*other cols)`` gives a deterministic,
    uniform in-repo split.

    NULL-safe: placement joins run on a sentinel string key (NULL and
    keys missing from caller ``key_counts`` both get placed, never
    dropped). Caller-supplied ``key_counts`` keys are matched via their
    string form (``str(k)`` must equal Spark's string cast — true for
    string/int keys).
    """
    spark = df.sparkSession
    default_par = spark.sparkContext.defaultParallelism
    hash_cols = [c for c in df.columns if c != salt_col][:3] or [salt_col]
    # NULL salt keys never match an equi-join (SQL null semantics), so all
    # placement joins run on a prefixed-string sentinel key: NULL -> "n:",
    # value v -> "v:<v>", rows whose key is missing from caller-supplied
    # stats -> the "o:" fallback key. No row can be dropped by placement.
    skey = F.when(F.col(f"`{salt_col}`").isNull(), F.lit("n:")).otherwise(
        F.concat(F.lit("v:"), F.col(f"`{salt_col}`").cast("string"))
    )
    orig_cols = list(df.columns)
    df = df.withColumn("__skey", skey)
    # one pruned-scan job; bucket math on the driver (#keys ≪ #rows —
    # at 10^12 files this is #repos rows, still driver-sized).
    # ``key_counts`` lets callers supply maintained table statistics
    # (the Iceberg partition-stats pattern) instead of rescanning.
    caller_counts = key_counts is not None
    # ``capped``: the self-collected stats hit SALT_STATS_CAP — only the
    # heaviest ``cap`` keys were kept exact; ``rest_equiv`` is the folded
    # remainder mass (equivalent rows) that sizes the "o:" fallback bucket.
    capped = False
    rest_equiv = 0
    cap = SALT_STATS_CAP
    if key_counts is None and weight_col is not None:
        # byte-weighted placement: bucket allocation follows each key's
        # PAYLOAD BYTES, not its row count. Row counts under-provision a
        # repo of few giant files (and over-provision many tiny ones) —
        # at 10^12-file scale that is the straggler/OOM skew that row
        # counting cannot see. Weights are rescaled to "equivalent rows"
        # (key_bytes × total_rows / total_bytes) so ``rows_per_bucket``
        # keeps its meaning and total bucket count stays comparable.
        # Same single pruned scan (count + sum(length) partials); the
        # driver keeps only the top-``cap`` heaviest keys (deterministic:
        # weight desc, count desc, key) — a second aggregate job computes
        # the remainder mass only when the cap actually triggers.
        cnt = df.groupBy("__skey").agg(
            F.count("*").alias("count"),
            F.coalesce(F.sum(F.length(_bq(weight_col))), F.lit(0)).alias("wbytes"),
        )
        agg = (cnt.orderBy(F.desc("wbytes"), F.desc("count"), "__skey")
               .limit(cap + 1).collect())
        if len(agg) > cap:
            capped = True
            agg = agg[:cap]
            tot = cnt.agg(F.sum("count").alias("r"),
                          F.sum("wbytes").alias("b")).collect()[0]
            total_rows = int(tot["r"] or 0) or 1
            total_bytes = int(tot["b"] or 0)
            rest_rows = total_rows - sum(r["count"] for r in agg)
            rest_bytes = total_bytes - sum(r["wbytes"] for r in agg)
        else:
            total_rows = sum(r["count"] for r in agg) or 1
            total_bytes = sum(r["wbytes"] for r in agg)
            rest_rows = rest_bytes = 0
        if total_bytes > 0:
            key_counts = [
                # all-NULL-payload keys fall back to their row count
                (r[0], max(1, round(r["wbytes"] * total_rows / total_bytes))
                 if r["wbytes"] > 0 else r["count"])
                for r in agg
            ]
            rest_equiv = (max(1, round(rest_bytes * total_rows / total_bytes))
                          if rest_bytes > 0 else rest_rows)
        else:  # weight column empty/NULL everywhere: behave like rows
            key_counts = [(r[0], r["count"]) for r in agg]
            rest_equiv = rest_rows
    elif key_counts is None:
        cnt = df.groupBy("__skey").count()
        rows = (cnt.orderBy(F.desc("count"), "__skey")
                .limit(cap + 1).collect())
        if len(rows) > cap:
            capped = True
            rows = rows[:cap]
            total_rows = int(cnt.agg(F.sum("count")).collect()[0][0] or 0)
            rest_equiv = total_rows - sum(r["count"] for r in rows)
        key_counts = [(r[0], r["count"]) for r in rows]
    else:
        # dedupe/aggregate by the STRINGIFIED key: duplicate caller keys (or
        # mixed-type keys whose string forms collide, int 1 vs '1') would
        # otherwise produce duplicate __skey rows in the broadcast bucket map
        # and the placement join would silently MULTIPLY matching data rows
        merged: dict[str, int] = {}
        for k, c in key_counts:
            sk = "n:" if k is None else f"v:{k}"
            merged[sk] = merged.get(sk, 0) + int(c)
        key_counts = list(merged.items())
    # SORT by key: bucket ordinals (and therefore row→partition placement)
    # must be a pure function of the key-count multiset, not of the
    # nondeterministic collect() order of the counting scan — otherwise a
    # replayed run over differently-partitioned input places rows onto
    # different partitions and exactly-once replay breaks bit-identity.
    key_counts = sorted(key_counts)
    if not key_counts:  # empty input: nothing to salt, keep a valid plan
        return {"empty": True, "df": df, "orig_cols": orig_cols,
                "key_counts_sentinel": []}

    # caller-supplied stats may be stale/incomplete: reserve a bounded
    # fallback key for rows whose key has no bucket entry (appended LAST
    # so existing keys keep their bucket/partition assignment). Carved
    # OUT of num_partitions, not added on top, so an explicit partition
    # count is honored exactly.
    if caller_counts:
        nb_other = max(1, (num_partitions or default_par) // 8)
    elif capped:
        # fallback bucket sized from the MEASURED remainder mass (unlike
        # the caller-stats path, the capped scan knows it exactly)
        if num_partitions:
            total_all = sum(c for _, c in key_counts) + rest_equiv
            nb_other = min(
                max(1, round(num_partitions * rest_equiv / max(1, total_all))),
                max(1, num_partitions - 1),
            )
        else:
            nb_other = max(1, math.ceil(rest_equiv / rows_per_bucket))
        nb_other = min(nb_other, (1 << _NB_BITS) - 1)
    else:
        nb_other = 0
    alloc_target = (num_partitions - nb_other) if num_partitions else None
    # bucket allocation: proportional when a target partition count is
    # given (sum == alloc_target exactly), else ceil(count / rows_per_bucket)
    if alloc_target and alloc_target >= len(key_counts):
        total = sum(c for _, c in key_counts) or 1
        alloc = [
            (k, max(1, int(c * alloc_target / total))) for k, c in key_counts
        ]
        # fix rounding drift on the largest key
        drift = alloc_target - sum(b for _, b in alloc)
        big = max(range(len(alloc)), key=lambda i: key_counts[i][1])
        alloc[big] = (alloc[big][0], max(1, alloc[big][1] + drift))
        bucket_rows = alloc
    else:
        bucket_rows = [
            (k, max(1, math.ceil(c / rows_per_bucket))) for k, c in key_counts
        ]
    if nb_other:
        bucket_rows.append(("o:", nb_other))
    P = int(sum(b for _, b in bucket_rows))

    def _with_buckets(frame: DataFrame) -> DataFrame:
        buckets = spark.createDataFrame(bucket_rows, ["__skey", "n_buckets"])
        joined = frame.join(F.broadcast(buckets), "__skey", "left")
        if caller_counts or capped:
            joined = joined.withColumn(
                "__skey",
                F.when(F.col("n_buckets").isNull(), F.lit("o:")).otherwise(F.col("__skey")),
            ).withColumn(
                "n_buckets",
                F.coalesce(F.col("n_buckets"), F.lit(bucket_rows[-1][1])),
            )
        return joined.withColumn(
            "__salt",
            F.pmod(F.xxhash64(*[_bq(c) for c in hash_cols]), F.col("n_buckets")).cast("int"),
        ).drop("n_buckets")

    return {
        "empty": False,
        "df": df,
        "orig_cols": orig_cols,
        "bucket_rows": bucket_rows,
        "P": P,
        "with_buckets": _with_buckets,
        "hash_cols": hash_cols,
        "caller_counts": caller_counts,
        "capped": capped,
        "key_counts_sentinel": key_counts,
    }


def _capture_plan_stats(stats_out, pre):
    if stats_out is not None:
        stats_out["key_counts"] = pre["key_counts_sentinel"]
        stats_out["caller_counts"] = pre.get("caller_counts", False)
        stats_out["capped"] = pre.get("capped", False)


# key-count ceiling for the literal-map placement fast path: below it the
# bucket map compiles into the projection itself (element_at on map/array
# literals — stays inside WholeStageCodegen, no BroadcastExchange, and
# measured ~7s cheaper per 1M rows than feeding mapInArrow from a join
# output on this host); above it the broadcast-join path takes over
# (millions of repos can't live in a plan literal).
LITERAL_MAP_MAX_KEYS = 1024
_NB_BITS = 21  # packed long = (bucket base << 21) | n_buckets


def _g_expr_literal(bucket_rows: list[tuple], hash_cols: list[str],
                    caller_counts: bool):
    """Global-bucket-ordinal expression via plan literals: one map lookup
    gives (base offset, n_buckets) packed in a long; g = base + salt.
    Rows whose key is missing fall back to the trailing "o:" entry when
    caller stats were supplied (mirrors the join path's fallback)."""
    packed = []
    base = 0
    for k, nb in bucket_rows:
        packed.append((k, (base << _NB_BITS) | nb))
        base += nb
    args: list = []
    for k, v in packed:
        args.append(F.lit(k))
        args.append(F.lit(v))
    pk = F.element_at(F.create_map(*args), F.col("__skey"))
    if caller_counts:  # "o:" is the last entry by construction
        pk = F.coalesce(pk, F.lit(packed[-1][1]))
    nb_col = pk.bitwiseAND(F.lit((1 << _NB_BITS) - 1))
    base_col = F.shiftright(pk, _NB_BITS)
    salt = F.pmod(F.xxhash64(*[_bq(c) for c in hash_cols]), nb_col)
    return (base_col + salt).cast("int")


def plan_salted(df: DataFrame, rows_per_bucket: int = 250_000,
                num_partitions: int | None = None,
                salt_col: str | None = "repo",
                sort_cols: list[str] | None = None,
                key_counts: list[tuple] | None = None,
                stats_out: dict | None = None,
                weight_col: str | None = None) -> tuple[DataFrame, int]:
    """Skew-defusing salted repartition + in-partition sort (the legacy
    row-shuffle encode plan; see ``plan_partition_ids`` for the
    blob-shuffle variant). Tables without the salt column fall back to a
    plain round-robin repartition (no skew key to defuse).

    ``stats_out``: optional dict the planner fills with the (sentinel-
    keyed) key counts it used — callers persist these as maintained
    table statistics (the Iceberg partition-stats pattern)."""
    spark = df.sparkSession
    if salt_col == "repo" and "repo" not in df.columns:
        salt_col = None
    if sort_cols is None:
        sort_cols = [c for c in ("repo", "path", "commit") if c in df.columns]
    default_par = spark.sparkContext.defaultParallelism

    if salt_col is None:
        n = df.count()
        P = num_partitions or max(math.ceil(n / rows_per_bucket), default_par)
        out = df.repartition(P)
        if sort_cols:
            out = out.sortWithinPartitions(*[_bq(c) for c in sort_cols])
        return out, P

    pre = _salted_prelude(df, rows_per_bucket, num_partitions, salt_col,
                          key_counts, weight_col=weight_col)
    _capture_plan_stats(stats_out, pre)
    if pre["empty"]:
        P = num_partitions or 1
        return pre["df"].drop("__skey").repartition(P), P
    bucket_rows, P, _with_buckets = pre["bucket_rows"], pre["P"], pre["with_buckets"]
    df, orig_cols = pre["df"], pre["orig_cols"]

    if len(bucket_rows) <= LITERAL_MAP_MAX_KEYS:
        # literal-map fast path: placement is a pure projection (codegen)
        g = _g_expr_literal(bucket_rows, pre["hash_cols"],
                            pre["caller_counts"] or pre["capped"])
        # cast to long BEFORE the exchange hashes it: partition_tokens
        # targets Murmur3.hashLong, and an array<int> literal would make
        # HashPartitioning use hashInt — landing buckets on wrong partitions
        tok = F.element_at(F.lit(partition_tokens(P)), g + F.lit(1)).cast("long")
        out = df.withColumn("__tok", tok).repartition(P, F.col("__tok"))
    elif len(bucket_rows) > 200_000:
        # too many keys to broadcast an expanded bucket map — fall back to
        # plain hash placement (collision imbalance bounded at this scale
        # because partitions ≫ buckets-per-partition)
        out = _with_buckets(df).repartition(P, F.col("__skey"), F.col("__salt"))
    else:
        # EXACT bucket→partition placement: each (key, salt) pair carries a
        # precomputed token whose Murmur3 hash lands on its own partition —
        # no birthday-collision imbalance (a plain repartition(P, key, salt)
        # can stack 2-3 buckets on one partition while others stay empty)
        tokens = partition_tokens(P)
        expanded = []
        g = 0
        for k, nb in bucket_rows:
            for s in range(nb):
                expanded.append((k, s, tokens[g]))
                g += 1
        exp_df = spark.createDataFrame(expanded, ["__skey", "__salt", "__tok"])
        salted = _with_buckets(df).join(F.broadcast(exp_df), ["__skey", "__salt"])
        out = salted.repartition(P, F.col("__tok"))
    if sort_cols:
        out = out.sortWithinPartitions(*[_bq(c) for c in sort_cols])
    return out.select(*[_bq(c) for c in orig_cols]), P


def plan_partition_ids(df: DataFrame, rows_per_bucket: int = 250_000,
                       num_partitions: int | None = None,
                       salt_col: str | None = "repo",
                       key_counts: list[tuple] | None = None,
                       stats_out: dict | None = None,
                       weight_col: str | None = None) -> tuple[DataFrame, int]:
    """Skew plan for the blob-shuffle encode path: NO exchange — returns
    ``df`` plus an ``__pb`` int column (target partition index, 0..P-1)
    computed entirely map-side (broadcast joins + hash expressions).

    The pack kernel groups each input split's rows by ``__pb`` and ships
    one Arrow-IPC blob per (split, target partition), so the one exchange
    of the encode job moves ~splits×P fat binary rows instead of every
    data row. Same bucket allocation as ``plan_salted`` — a giant repo
    still fans out over many target partitions."""
    spark = df.sparkSession
    if salt_col == "repo" and "repo" not in df.columns:
        salt_col = None
    default_par = spark.sparkContext.defaultParallelism

    if salt_col is None:
        n = df.count()
        P = num_partitions or max(math.ceil(n / rows_per_bucket), default_par)
        # no skew key: spread rows round-robin over targets, map-side.
        # r6: per-split round-robin via the monotonic-id row counter
        # (lower 33 bits = row index within the split), offset by the
        # split id — NOT a content hash, whose binomial spread leaves
        # partitions 5-10% under target and flags a freshly packed
        # layout as fragmented (table_health min_fill boundary). Equal
        # counts per target, matching plan_salted's repartition(P)
        # round-robin; deterministic given the input's split structure,
        # which is the same guarantee the row path's round-robin has.
        rr = F.monotonically_increasing_id().bitwiseAND(
            F.lit((1 << 33) - 1)
        ) + F.spark_partition_id()
        return df.withColumn("__pb", F.pmod(rr, F.lit(P)).cast("int")), P

    pre = _salted_prelude(df, rows_per_bucket, num_partitions, salt_col,
                          key_counts, weight_col=weight_col)
    _capture_plan_stats(stats_out, pre)
    if pre["empty"]:
        P = num_partitions or 1
        return pre["df"].drop("__skey").withColumn("__pb", F.lit(0)), P
    bucket_rows, P, _with_buckets = pre["bucket_rows"], pre["P"], pre["with_buckets"]
    df, orig_cols = pre["df"], pre["orig_cols"]

    if len(bucket_rows) <= LITERAL_MAP_MAX_KEYS:
        g = _g_expr_literal(bucket_rows, pre["hash_cols"],
                            pre["caller_counts"] or pre["capped"])
        out = df.withColumn("__pb", g)
    elif len(bucket_rows) > 200_000:
        # hash placement fallback (mirrors plan_salted): partition index =
        # what HashPartitioning(__skey, __salt) % P would have chosen
        out = _with_buckets(df).withColumn(
            "__pb", F.pmod(F.hash("__skey", "__salt"), F.lit(P)).cast("int")
        )
    else:
        # exact placement: global bucket ordinal g IS the partition index
        expanded = []
        g = 0
        for k, nb in bucket_rows:
            for s in range(nb):
                expanded.append((k, s, g))
                g += 1
        exp_df = spark.createDataFrame(expanded, ["__skey", "__salt", "__pb"])
        out = _with_buckets(df).join(F.broadcast(exp_df), ["__skey", "__salt"])
    return out.select(*[_bq(c) for c in orig_cols], "__pb"), P


PACK_SCHEMA = T.StructType(
    [
        T.StructField("__tok", T.LongType(), False),
        T.StructField("__pb", T.IntegerType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("blob", T.BinaryType(), False),
    ]
)


def pack_kernel_factory(data_cols: list[str], tokens: list[int]):
    """Map-side pre-pack: group THIS input split's rows by target
    partition (``__pb``) and emit ONE Arrow-IPC blob per group.

    This is the exchange-tax fix: the salted shuffle then moves
    ~splits×P fat binary rows instead of every data row, so the
    post-shuffle row→Arrow conversion cost (measured ~2.2s/1M rows) and
    the per-row exchange serialization both collapse to near zero. All
    grouping is vectorized (numpy argsort + one Arrow take); the only
    Python loop is per-blob, not per-row."""
    import numpy as np

    def kernel(batches):
        parts: list[pa.RecordBatch] = []
        for batch in batches:
            if batch.num_rows:
                parts.append(batch)
        if not parts:
            return
        tbl = pa.Table.from_batches(parts).combine_chunks()
        pb = tbl.column("__pb").to_numpy()
        data = tbl.select(data_cols)
        order = np.argsort(pb, kind="stable")
        sorted_pb = pb[order]
        bounds = np.flatnonzero(np.diff(sorted_pb)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(pb)]))
        taken = data.take(pa.array(order))
        toks, pbs, nrows, blobs = [], [], [], []
        for s, e in zip(starts, ends):
            sl = taken.slice(s, e - s)
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, sl.schema) as w:
                w.write_table(sl)
            g = int(sorted_pb[s])
            blobs.append(sink.getvalue().to_pybytes())
            pbs.append(g)
            toks.append(tokens[g])
            nrows.append(int(e - s))
        yield pa.RecordBatch.from_pydict(
            {"__tok": toks, "__pb": pbs, "n_rows": nrows, "blob": blobs},
            schema=pa.schema(
                [
                    ("__tok", pa.int64()),
                    ("__pb", pa.int32()),
                    ("n_rows", pa.int64()),
                    ("blob", pa.binary()),
                ]
            ),
        )

    return kernel


def unpack_encode_kernel_factory(columns: list[str],
                                 codec_overrides: dict | None,
                                 skip_parts: frozenset[int] | None = None,
                                 manifest_dir: str | None = None,
                                 name_map: dict[str, str] | None = None,
                                 codec_opts: dict | None = None,
                                 sort_names: list[str] | None = None,
                                 batch_rows: int = 16384,
                                 from_blobs: bool = True,
                                 part_offset: int = 0,
                                 bloom_columns: frozenset[str] | None = None,
                                 ndv_columns: frozenset[str] | None = None,
                                 qsk_columns: frozenset[str] | None = None):
    """Post-shuffle encode kernel: materialize the partition (from
    Arrow-IPC blob rows when ``from_blobs``, else directly from the data
    batches), sort rows IN THE KERNEL (numpy/Arrow sort — replaces a JVM
    ``sortWithinPartitions`` whose UnsafeRow sort costs more than an
    argsort+take merged into the kernel's memory traffic), slice into
    chunk-sized batches, and run the shared encode kernel per batch.
    Partition size is bounded by rows_per_bucket — the same contract the
    salted plan enforces. IPC decode is memcpy-level; the per-blob loop
    is O(#blobs) ≈ splits, never per-row."""
    overrides = codec_overrides or {}
    base_opts = codec_opts or {}
    skip = skip_parts or frozenset()
    name_map = name_map or {c: c for c in columns}
    repo_batch_col = next((b for b, o in name_map.items() if o == "repo"), None)

    def kernel(batches):
        ctx = TaskContext.get()
        part_id = (ctx.partitionId() if ctx is not None else 0) + part_offset
        if part_id in skip:
            return
        tables: list[pa.Table] = []
        if from_blobs:
            for batch in batches:
                blob_arr = batch.column("blob")
                for i in range(len(blob_arr)):
                    buf = blob_arr[i].as_buffer()  # zero-copy view
                    with pa.ipc.open_stream(pa.BufferReader(buf)) as r:
                        tables.append(r.read_all())
        else:
            parts = [b for b in batches if b.num_rows]
            if parts:
                tables.append(pa.Table.from_batches(parts))
        if not tables:
            return
        tbl = pa.concat_tables(tables).combine_chunks()
        if sort_names:
            tbl = tbl.sort_by(
                [(c, "ascending") for c in sort_names],
                null_placement="at_start",  # Spark sorts NULLS FIRST asc
            )
        frag: list[dict] = []
        seq = 0
        for off in range(0, tbl.num_rows, batch_rows):
            sl = tbl.slice(off, batch_rows).combine_chunks()
            for b in sl.to_batches():
                if b.num_rows == 0:
                    continue
                meta, out = _encode_one_batch(
                    b, part_id, seq, columns, name_map, overrides,
                    base_opts, repo_batch_col, bloom_columns,
                    ndv_columns, qsk_columns,
                )
                frag.append(meta)
                yield out
                seq += 1
        _write_fragment(manifest_dir, part_id, frag)

    return kernel


def encoded_shuffle_schema(n_cols: int) -> T.StructType:
    """Stage-1 output of the encoded shuffle: a final chunk row plus the
    routing/ordering sidecar columns stage 2 strips."""
    base = chunk_schema(n_cols)
    return T.StructType(
        list(base.fields)
        + [
            T.StructField("meta_json", T.StringType(), False),
            T.StructField("src_split", T.IntegerType(), False),
            T.StructField("local_seq", T.IntegerType(), False),
            T.StructField("__tok", T.LongType(), False),
        ]
    )


def encoded_pack_kernel_factory(columns: list[str], tokens: list[int],
                                codec_overrides: dict | None,
                                name_map: dict[str, str] | None = None,
                                codec_opts: dict | None = None,
                                part_offset: int = 0,
                                sort_names: list[str] | None = None,
                                batch_rows: int = 16384,
                                bloom_columns: frozenset[str] | None = None,
                                ndv_columns: frozenset[str] | None = None,
                                qsk_columns: frozenset[str] | None = None):
    """Stage 1 of ``shuffle="encoded"``: encode THIS input split's rows
    per target partition BEFORE the exchange, so the shuffle moves the
    final compressed chunk bytes (~0.25-0.3x of raw on this corpus)
    instead of every data row — and the expensive work (zstd/fsst/prefix
    kernels, stats, blooms) runs exactly once, map-side, where the
    no-shuffle path already proved the input conversion cheap.

    Contrast with the rejected blob pre-pack (SCALE.md): that variant
    shipped the RAW rows as Arrow-IPC blobs and still paid the full
    encode after the exchange; this one ships nothing that is not final
    output. The trade is chunk granularity: each (input split, target
    bucket) intersection becomes its own chunk, so unclustered inputs
    produce smaller chunks than the row shuffle's 16k-row slices — a
    documented compression-ratio trade, not a correctness one."""
    import struct as _struct

    import numpy as np
    import pyarrow.compute as pc

    overrides = codec_overrides or {}
    base_opts = codec_opts or {}
    name_map = name_map or {c: c for c in columns}
    repo_batch_col = next((b for b, o in name_map.items() if o == "repo"), None)
    # Slices below the stage-2 consolidation threshold are decoded and
    # re-encoded there REGARDLESS of how well stage 1 encoded them — so
    # running the full codec pipeline (selector trials, zstd-3, stats,
    # sha256, blooms) on them is pure double work. Ship them as TRANSIT
    # chunklets instead: one whole-slice Arrow-IPC blob, lz4-framed and
    # length-prefixed, in payload.__c0 (stats == "t" marks the row for
    # stage 2, which inlines the table instead of per-column decodes).
    # Measured ~290 MB/s pack at ~0.53x of raw on the wire — vs the row
    # exchange's 1.0x and the full encode's ~140 MB/s — and transit rows
    # can never reach disk: n_rows < min_rows routes every one of them
    # into a consolidation run by contract. Slices at/above the
    # threshold still get the one real encode map-side and pass through
    # stage 2 untouched. Final layout is unchanged where it matters: the
    # consolidation merge rule is a pure function of the ordered
    # chunklet ROW COUNTS, which this does not change.
    min_rows = max(1, batch_rows // 4)
    payload_type = pa.struct(
        [(f"__c{i}", pa.binary()) for i in range(len(columns))]
    )
    transit_schema = pa.schema(
        [
            ("part_id", pa.int32()),
            ("chunk_seq", pa.int32()),
            ("n_rows", pa.int64()),
            ("payload", payload_type),
            ("stats", pa.string()),
            ("content_sha", pa.string()),
            ("raw_bytes", pa.int64()),
            ("encoded_bytes", pa.int64()),
            ("repo_min", pa.string()),
            ("repo_max", pa.string()),
        ]
    )

    extra_schema = pa.schema(
        [("meta_json", pa.string()), ("src_split", pa.int32()),
         ("local_seq", pa.int32()), ("__tok", pa.int64())]
    )
    full_schema = pa.schema(list(transit_schema) + list(extra_schema))

    def kernel(batches):
        ctx = TaskContext.get()
        split = ctx.partitionId() if ctx is not None else 0
        parts = [b for b in batches if b.num_rows]
        if not parts:
            return
        _lz4 = pa.Codec("lz4")  # per task: pa.Codec does not pickle
        tbl = pa.Table.from_batches(parts).combine_chunks()
        # group the split by target bucket with a cheap stable integer
        # argsort (NOT a multi-key string sort: the full-split
        # (__pb, repo, path, commit) sort_indices + take measured ~1s/4
        # cores on 1M rows and its key ordering is thrown away for every
        # transit chunklet anyway — consolidation re-sorts the merged
        # run). Slices large enough to become final chunks directly get
        # a slice-local key sort below, which equals the old global
        # stable sort restricted to the slice.
        pb_pre = tbl.column("__pb").to_numpy()
        order = np.argsort(pb_pre, kind="stable")
        tbl = tbl.take(pa.array(order))
        pb = pb_pre[order]
        data = tbl.drop_columns(["__pb"])
        bounds = np.flatnonzero(np.diff(pb)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(pb)]))
        # transit rows accumulate into ONE combined output batch per
        # task (plus one per real-encoded chunk): yielding each chunklet
        # as its own 1-row batch costs an Arrow IPC frame per slice —
        # splits x buckets frames on scattered inputs, measured ~1s/4
        # cores of pure framing at 1M rows
        t_pid: list[int] = []
        t_rows: list[int] = []
        t_blob: list[bytes] = []
        t_tok: list[int] = []
        real: list[pa.RecordBatch] = []
        for s, e in zip(starts, ends):
            g = int(pb[s])
            part_id = part_offset + g
            tok = tokens[g]
            local = 0
            sub = data.slice(s, e - s)
            if sub.num_rows < min_rows:
                # transit chunklet: stage 2 consolidation re-encodes it
                # (n_rows < min_rows routes it into a run by contract)
                sink = pa.BufferOutputStream()
                sc = sub.combine_chunks()
                with pa.ipc.new_stream(sink, sc.schema) as w:
                    w.write_table(sc)
                ipc = sink.getvalue()
                t_pid.append(part_id)
                t_rows.append(sub.num_rows)
                t_blob.append(
                    _struct.pack("<q", len(ipc))
                    + _lz4.compress(ipc, asbytes=True)
                )
                t_tok.append(tok)
                continue
            if sort_names:
                # slice-local key sort (stable, equals the old global
                # (__pb, keys) stable sort restricted to this slice):
                # these rows become final chunks as-is, so they keep the
                # zone/compression locality of the sorted layout
                sub = sub.take(pc.sort_indices(
                    sub,
                    sort_keys=[(c, "ascending") for c in sort_names],
                    null_placement="at_start",
                ))
            for off in range(0, sub.num_rows, batch_rows):
                sl = sub.slice(off, batch_rows).combine_chunks()
                for b in sl.to_batches():
                    if b.num_rows == 0:
                        continue
                    meta, out = _encode_one_batch(
                        b, part_id, local, columns, name_map, overrides,
                        base_opts, repo_batch_col, bloom_columns,
                        ndv_columns, qsk_columns,
                    )
                    extra = pa.RecordBatch.from_pydict(
                        {
                            "meta_json": [json.dumps(meta)],
                            "src_split": [split],
                            "local_seq": [local],
                            "__tok": [tok],
                        },
                        schema=extra_schema,
                    )
                    real.append(pa.RecordBatch.from_arrays(
                        list(out.columns) + list(extra.columns),
                        schema=full_schema,
                    ))
                    local += 1
        if t_pid:
            n_t = len(t_pid)
            payload = pa.StructArray.from_arrays(
                [pa.array(t_blob, pa.binary())]
                + [pa.nulls(n_t, pa.binary())
                   for _ in range(1, len(columns))],
                names=[f"__c{i}" for i in range(len(columns))],
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(t_pid, pa.int32()),
                    pa.array([0] * n_t, pa.int32()),
                    pa.array(t_rows, pa.int64()),
                    payload,
                    pa.array(["t"] * n_t, pa.string()),
                    pa.array([""] * n_t, pa.string()),
                    pa.array([0] * n_t, pa.int64()),
                    pa.array([len(b) for b in t_blob], pa.int64()),
                    pa.nulls(n_t, pa.string()),
                    pa.nulls(n_t, pa.string()),
                    pa.array(["{}"] * n_t, pa.string()),
                    pa.array([split] * n_t, pa.int32()),
                    pa.array([0] * n_t, pa.int32()),
                    pa.array(t_tok, pa.int64()),
                ],
                schema=full_schema,
            )
        yield from real

    return kernel


def encoded_merge_kernel_factory(n_cols: int, manifest_dir: str | None = None,
                                 columns: list[str] | None = None,
                                 codec_overrides: dict | None = None,
                                 name_map: dict[str, str] | None = None,
                                 codec_opts: dict | None = None,
                                 batch_rows: int = 16384,
                                 bloom_columns: frozenset[str] | None = None,
                                 ndv_columns: frozenset[str] | None = None,
                                 qsk_columns: frozenset[str] | None = None,
                                 sort_names: list[str] | None = None):
    """Stage 2 of ``shuffle="encoded"``: renumber this partition's
    chunklets into a deterministic chunk_seq order — (src_split,
    local_seq), a pure function of the input layout — and task-commit
    the manifest fragment.

    Chunklets at/above ``batch_rows // 4`` rows pass through untouched
    (no decode, no re-encode — cost O(#chunklets)); CONSECUTIVE runs of
    smaller ones are decoded, concatenated in order, and re-encoded at
    full chunk size. That consolidation is what keeps footprint stable
    on scattered inputs: a fully random input makes every (split,
    bucket) intersection tiny, and tiny chunks pay per-chunk overhead
    plus short-buffer compression loss (measured 1.9x footprint at 300-
    row chunklets). Clustered inputs — the common production shape —
    skip it almost entirely. The merge rule is a pure function of the
    ordered chunklet sizes, so layout determinism is preserved."""
    import pyarrow.compute as pc

    from fhirflat_spark.codecs import decode_array

    strip = ["meta_json", "src_split", "local_seq", "__tok"]
    min_rows = max(1, batch_rows // 4)
    columns = columns or [f"__c{i}" for i in range(n_cols)]
    name_map = name_map or {c: c for c in columns}
    overrides = codec_overrides or {}
    base_opts = codec_opts or {}
    repo_batch_col = next((b for b, o in name_map.items() if o == "repo"), None)

    import struct as _struct

    def _decode_run(rows: pa.Table) -> pa.Table:
        """Chunklet rows → the original data table (order-preserving).

        Two chunklet flavors: stage-1 TRANSIT rows (stats == "t") carry
        one lz4-framed whole-slice Arrow-IPC blob in ``__c0``; real
        chunklets decode per column through the codec registry."""
        _lz4 = pa.Codec("lz4")  # per call: pa.Codec does not pickle
        tables: list[pa.Table] = []
        payload = rows.column("payload")
        stats_col = rows.column("stats")
        for i in range(rows.num_rows):
            cell = payload[i]
            if stats_col[i].as_py() == "t":
                buf = memoryview(cell["__c0"].as_buffer())
                (rawsize,) = _struct.unpack_from("<q", buf, 0)
                ipc = _lz4.decompress(buf[8:], decompressed_size=rawsize)
                with pa.ipc.open_stream(pa.BufferReader(ipc)) as r:
                    tables.append(r.read_all().select(columns))
                continue
            tables.append(pa.table({
                c: decode_array(memoryview(cell[f"__c{j}"].as_buffer()))
                for j, c in enumerate(columns)
            }))
        first = tables[0].schema
        unified = [t if t.schema == first else t.cast(first) for t in tables]
        return pa.concat_tables(unified).combine_chunks()

    def kernel(batches):
        parts = [b for b in batches if b.num_rows]
        if not parts:
            return
        tbl = pa.Table.from_batches(parts).combine_chunks()
        tbl = tbl.take(pc.sort_indices(
            tbl,
            sort_keys=[("part_id", "ascending"), ("src_split", "ascending"),
                       ("local_seq", "ascending")],
        ))
        pids = tbl.column("part_id").to_pylist()
        nrows = tbl.column("n_rows").to_pylist()
        metas = tbl.column("meta_json").to_pylist()
        out_tbl = tbl.drop_columns(strip)

        # segment the partition-ordered chunklets: a "run" is a maximal
        # stretch of consecutive small chunklets within one part_id
        frag: list[dict] = []
        seq = 0
        prev_pid = None
        run: list[int] = []
        run_rows = 0

        def _flush_run():
            nonlocal seq, run, run_rows
            if not run:
                return
            sub = out_tbl.take(pa.array(run, pa.int64()))
            data = _decode_run(sub)
            if sort_names:
                # transit chunklets arrive bucket-grouped but key-UNSORTED
                # (stage 1 skips the key sort for them); ordering the
                # merged run here restores the sorted-chunk locality —
                # tighter per-chunk zones and the compression win of
                # clustered prefixes — at 16k-row sort cost
                data = data.take(pc.sort_indices(
                    data,
                    sort_keys=[(c, "ascending") for c in sort_names],
                    null_placement="at_start",
                ))
            for off in range(0, data.num_rows, batch_rows):
                sl = data.slice(off, batch_rows).combine_chunks()
                for b in sl.to_batches():
                    if b.num_rows == 0:
                        continue
                    meta, out = _encode_one_batch(
                        b, prev_pid, seq, columns, name_map, overrides,
                        base_opts, repo_batch_col, bloom_columns,
                        ndv_columns, qsk_columns,
                    )
                    frag.append(meta)
                    # one canonical schema for every yielded batch: the
                    # pass-through rows carry Spark's (non-null-marked)
                    # field flavor, _encode_one_batch a nullable one —
                    # Arrow's output writer rejects the mix
                    yield out.cast(out_tbl.schema)
                    seq += 1
            run, run_rows = [], 0

        def _flush_part():
            nonlocal frag, seq
            if prev_pid is not None and frag:
                _write_fragment(manifest_dir, prev_pid, frag)
            frag, seq = [], 0

        for i in range(out_tbl.num_rows):
            pid = pids[i]
            if pid != prev_pid:
                yield from _flush_run()
                _flush_part()
                prev_pid = pid
            if nrows[i] < min_rows:
                run.append(i)
                run_rows += nrows[i]
                if run_rows >= batch_rows:
                    yield from _flush_run()
                continue
            yield from _flush_run()
            meta = json.loads(metas[i])
            meta["chunk_seq"] = seq
            frag.append(meta)
            row = out_tbl.slice(i, 1)
            row = row.set_column(
                row.schema.get_field_index("chunk_seq"),
                out_tbl.schema.field("chunk_seq"),  # keep nullability flag
                pa.array([seq], pa.int32()),
            )
            yield from row.to_batches()
            seq += 1
        yield from _flush_run()
        _flush_part()

    return kernel


def detect_clustering(df: DataFrame, salt_col: str = "repo",
                      rows_per_bucket: int = 250_000) -> bool:
    """True when the input's existing splits are already clustered on the
    salt key well enough that the salted exchange would buy nothing.

    One column-pruned scan job computes per-split (min, max, count) of the
    key; the splits count as clustered when (a) at most ~10% of their key
    ranges strictly interleave (a key merely TOUCHING a split boundary —
    one repo continuing into the next split — is still perfect locality)
    and (b) no split exceeds 4x the bucket-size target. This is the
    automatic form of the Iceberg-style "table already partitioned by
    repo" fast path: at 100 TB it turns re-encode of a clustered table
    into a zero-exchange job."""
    if salt_col not in df.columns:
        return False
    rows = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .agg(
            F.min(F.col(f"`{salt_col}`")).alias("lo"),
            F.max(F.col(f"`{salt_col}`")).alias("hi"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    if not rows:
        return True  # empty input: nothing to re-cluster
    spans = sorted((r["lo"], r["hi"]) for r in rows if r["lo"] is not None)
    if not spans:
        return False  # all-null keys: let the shuffle group them
    # compare against the RUNNING max of prior his, not just the previous
    # span — one wide split (e.g. a compacted file spanning the whole key
    # range) must count as interleaving with everything after it
    interleaved = 0
    running_hi = spans[0][1]
    for lo, hi in spans[1:]:
        if lo < running_hi:
            interleaved += 1
        if hi > running_hi:
            running_hi = hi
    max_n = max(r["n"] for r in rows)
    return interleaved <= max(1, len(spans) // 10) and max_n <= 4 * rows_per_bucket


@dataclass
class EncodeResult:
    out_dir: str
    num_partitions: int
    seconds: float
    rows: int
    raw_bytes: int
    encoded_bytes: int
    shuffled: bool = True

    @property
    def ratio(self) -> float:
        return self.encoded_bytes / max(self.raw_bytes, 1)

    @property
    def throughput_gbps(self) -> float:
        return self.raw_bytes / 1e9 / max(self.seconds, 1e-9)


def encode_table(
    df: DataFrame,
    out_dir: str,
    columns: list[str] | None = None,
    codec_overrides: dict | None = None,
    rows_per_bucket: int = 250_000,
    num_partitions: int | None = None,
    resume: bool = False,
    key_counts: list[tuple] | None = None,
    shuffle: bool | str = True,
    profile: str = "balanced",
    append: bool = False,
    part_offset: int = 0,
    overwrite_partitions: bool = False,
    max_new_partitions: int | None = None,
    bloom_columns: list[str] | None = None,
    ndv_columns: list[str] | None = None,
    quantile_columns: list[str] | None = None,
    delete_keys: tuple | None = None,
    delete_positions: DataFrame | None = None,
    weight_col: str | None = None,
    branch: str | None = None,
    replace_pids: set[int] | None = None,
) -> EncodeResult:
    """Encode ``df`` into ``out_dir`` (chunks + manifest + summary).

    ``replace_pids`` (append-only): partitions this commit REWRITES —
    their manifest rows are dropped from the new snapshot in the same
    atomic commit that adds the appended partitions (the Iceberg
    ``rewrite_data_files`` shape: one snapshot swaps old files for
    new). Their chunk dirs and fragment files stay on disk for
    time-travel until snapshot expiry + vacuum reclaim them.

    ``shuffle=False`` is the layout-preserving mode: encode each input
    split in place with NO exchange — correct for any input, optimal when
    the table is already clustered (e.g. an Iceberg table partitioned by
    repo); compression can be slightly worse because rows aren't
    re-sorted, and skew handling falls back to the source's file split
    sizes (``spark.sql.files.maxPartitionBytes`` caps a split, so a giant
    repo still spreads across tasks). The salted-shuffle mode stays the
    default because it guarantees sorted-prefix locality + skew defusal
    regardless of input layout. ``shuffle="auto"`` runs
    ``detect_clustering`` (one pruned scan) and picks the layout-
    preserving mode when the input is already clustered.

    ``weight_col`` (opt-in, e.g. ``"content"``): bucket allocation per
    salt key follows that column's total BYTES instead of row counts —
    bounds partition payload size when file sizes vary wildly across
    repos (row counts under-provision a repo of few giant files, the
    straggler/OOM skew a 10^12-file corpus actually has). Same single
    counting scan; ignored when ``key_counts`` is caller-supplied.

    ``shuffle="blob"`` is the experimental pre-pack path: rows are
    grouped per target partition map-side and shuffled as Arrow-IPC
    blobs (few fat rows instead of every data row). Measured SLOWER than
    the default on this host (1M rows, local[32], min-of-3: 18.5s vs
    12.9s same-session) because OSS PySpark's ``mapInArrow`` converts
    its input row→Arrow regardless of position — the pre-pack pays the
    full per-row conversion BEFORE the exchange and adds Python-side
    copies, while the exchange itself was already cheap once placement
    became a literal-map projection (~1s of a ~6s job). Kept as the seam
    for a columnar-shuffle runtime; not the default.

    ``shuffle="encoded"`` moves the encode BEFORE the exchange: stage 1
    sorts each input split by (target bucket, key prefix), kernel-
    encodes every (split, bucket) slice into final chunk rows, and the
    one exchange ships those COMPRESSED bytes (~0.25-0.3x of raw);
    stage 2 renumbers chunk_seq deterministically, CONSOLIDATES runs of
    small chunklets (decode+re-encode below batch_rows//4 rows — keeps
    footprint stable on scattered inputs), and commits the fragments.
    Since r6 this IS what ``shuffle=True`` runs (the golden manifest
    re-pinned to it as one deliberate format change): with the r6
    transit chunklets (slices below the consolidation threshold ship as
    lz4-framed whole-slice Arrow IPC instead of being fully encoded
    twice) and the data-driven stage-2 task count (~2 per core instead
    of one per target partition), it measured faster than the row
    exchange at EVERY level (1M rows, min-of-3, same host: local[1]
    17.2s vs 28.1, local[4] 5.1 vs 6.5, local[32] 2.4 vs 4.8) at
    footprint parity, and ships ~0.3-0.5x of raw on the wire vs the
    row exchange's 1.0x — the 100-TB lever. Layout is a pure function
    of the input (same input twice = same dataset checksum).
    ``shuffle="rows"`` keeps the legacy row exchange (``resume``
    implies it: stage-1 map-side encode cannot skip already-committed
    partitions).

    ``profile``: ``"balanced"`` (default — faster than a parquet/zstd
    write of the same table at near-identical footprint) or
    ``"archive"`` (high-volume string chunks compress at a higher zstd
    level: ~4-6% smaller than parquet/zstd at default AND level-matched
    settings, at a slower encode — the write-once/store-forever mode)."""
    from fhirflat_spark.manifest import (
        completed_partitions,
        load_fragments,
        write_manifest,
        write_summary,
    )

    if branch is not None and not append:
        raise ValueError("branch staging is append-only (WAP audits a "
                         "delta against an existing table)")
    if replace_pids:
        if not append:
            raise ValueError("replace_pids is a rewrite COMMIT against an "
                             "existing table; it requires append=True")
        if branch is not None:
            # a staged rewrite's manifest would hide main partitions from
            # the branch view and publish_branch fast-forwards blindly
            raise ValueError("replace_pids cannot be staged on a branch")
    if profile not in ("balanced", "archive"):
        raise ValueError(f"unknown profile {profile!r}")
    spark = df.sparkSession
    columns = columns or df.columns
    # bloom_columns: per-chunk Bloom filters for point-lookup pruning
    # (decode_table(point_filter=...)); string columns only — the probe
    # hashes utf-8 bytes. An append inherits the dataset's bloom
    # columns when the caller names none — otherwise any direct append
    # (e.g. the streaming sink) would write unbloomed chunks AND
    # rewrite the summary without the key, silently killing the
    # point-lookup capability
    if append and (bloom_columns is None or ndv_columns is None
                   or quantile_columns is None):
        from fhirflat_spark.manifest import read_summary as _read_summary

        try:
            _summary = _read_summary(spark, out_dir)
        except FileNotFoundError:
            _summary = {}
        if bloom_columns is None:
            bloom_columns = [
                c for c in _summary.get("bloom_columns", ()) if c in columns
            ]
        # ndv inherits for the same reason bloom does: a direct append
        # must not silently write unsketched chunks into a tracked table
        if ndv_columns is None:
            ndv_columns = [
                c for c in _summary.get("ndv_columns", ()) if c in columns
            ]
        if quantile_columns is None:
            quantile_columns = [
                c for c in _summary.get("quantile_columns", ())
                if c in columns
            ]
    bloom_set = frozenset(bloom_columns or ())
    for c in bloom_set:
        if c not in columns:
            raise ValueError(f"bloom column {c!r} not in encoded columns")
        if not isinstance(df.schema[c].dataType, T.StringType):
            raise ValueError(
                f"bloom column {c!r} must be a string column "
                f"(got {df.schema[c].dataType})"
            )
    ndv_set = frozenset(ndv_columns or ())
    for c in ndv_set:
        if c not in columns:
            raise ValueError(f"ndv column {c!r} not in encoded columns")
        if not isinstance(df.schema[c].dataType,
                          (T.StringType, T.BinaryType, T.ByteType,
                           T.ShortType, T.IntegerType, T.LongType)):
            raise ValueError(
                f"ndv column {c!r} must be a string/binary/integer column "
                f"(got {df.schema[c].dataType})"
            )
    qsk_set = frozenset(quantile_columns or ())
    for c in qsk_set:
        if c not in columns:
            raise ValueError(f"quantile column {c!r} not in encoded columns")
        if not isinstance(df.schema[c].dataType,
                          (T.ByteType, T.ShortType, T.IntegerType,
                           T.LongType, T.FloatType, T.DoubleType)):
            raise ValueError(
                f"quantile column {c!r} must be a numeric column "
                f"(got {df.schema[c].dataType})"
            )
    t0 = time.time()

    if shuffle == "auto":
        shuffle = not detect_clustering(df, rows_per_bucket=rows_per_bucket)
    if shuffle is True and not resume:
        # Re-clustering shuffles default to the ENCODED exchange (r6):
        # the one data-sized exchange carries compressed chunk bytes
        # (~0.3-0.5x of raw) instead of raw rows, and the expensive
        # kernel work runs where the input conversion is cheap. Measured
        # faster at every level (1M rows, same host, min-of-3: local[1]
        # 17.2s vs 28.1, local[4] 5.1 vs 6.5, local[32] 2.4 vs 4.8) and
        # ~2-3x fewer wire bytes at cluster scale. ``shuffle="rows"``
        # keeps the legacy row exchange; ``resume`` implies it (stage-1
        # map-side encode cannot skip already-committed partitions).
        shuffle = "encoded"
    elif shuffle == "rows":
        shuffle = True
    blob_mode = shuffle == "blob"
    encoded_mode = shuffle == "encoded"
    if encoded_mode and resume:
        # stage-1 encodes map-side with no knowledge of which FINAL
        # partitions already committed — a resume cannot skip work here
        raise ValueError('resume is not supported with shuffle="encoded"; '
                         "re-run the encode (or use shuffle=\"rows\")")

    skip: frozenset[int] = frozenset()
    frag_live: set[int] | None = None  # append: head-reachable pid filter
    mode = "overwrite"
    if append:
        # incremental append: new data lands in NEW part_id directories
        # (offset past every existing partition); old manifest fragments
        # stay in place and write_manifest re-merges old + new.
        # overwrite_partitions flips to dynamic partition overwrite:
        # re-running the SAME part_offset range replaces exactly its own
        # partition dirs — the idempotence a replayed streaming
        # micro-batch needs for exactly-once.
        mode = "overwrite" if overwrite_partitions else "append"
    elif resume:
        skip = completed_partitions(spark, out_dir)
        mode = "append" if skip else "overwrite"

    frag_dir = f"{out_dir}/manifest_parts"
    if not (resume or append):
        # a fresh encode owns the whole table: stale stats fragments from
        # previous contents would otherwise survive when write_key_counts
        # (fresh=True) is skipped (caller-supplied counts / no-shuffle /
        # no salt column) and corrupt load_key_counts totals; stale
        # snapshots would time-travel into a different table's history
        from fhirflat_spark import fsio
        from fhirflat_spark.manifest import _deletes_dir, _snap_dir, _stats_dir

        fsio.delete_dir(frag_dir)
        fsio.delete_dir(_stats_dir(out_dir))
        fsio.delete_dir(_snap_dir(out_dir))
        fsio.delete_dir(_deletes_dir(out_dir))
    elif append:
        # crashed-attempt fragment sweep: tasks write manifest fragments
        # as a side effect DURING the job, so a killed append leaves
        # fragments for part ids its chunk files never committed. A
        # retry re-mints the same offset, but if it plans FEWER
        # partitions the leftovers above its range would merge into the
        # manifest as phantom partitions pointing at missing chunk dirs.
        # Any fragment at/above this run's offset that no retained
        # snapshot references is exactly such a leftover (committed pids
        # are always snapshot-referenced; this run's fragments don't
        # exist yet) — delete them before the job starts.
        # Below the offset, the new manifest must mirror the LIVE head:
        # the keep-set is the current head's part ids plus staged branch
        # partitions. Pids outside it (rolled-back appends — including
        # the stale files a CRASHED rollback sweep leaves behind) are
        # filtered out at merge time (frag_live below) rather than
        # deleted: their fragments are the only chunk-level metadata for
        # those partitions, and a later rollback BACK onto one of their
        # snapshots must still find them (fragments for pids in any
        # retained snapshot stay on disk until the snapshot expires).
        from fhirflat_spark import fsio
        from fhirflat_spark.manifest import (
            _branch_staged_versions,
            all_snapshot_part_ids,
            current_snapshot,
            snapshot_part_ids,
        )

        committed = all_snapshot_part_ids(out_dir)
        head = current_snapshot(out_dir)
        frag_live = set(snapshot_part_ids(out_dir, head)) if head else set()
        for sv in _branch_staged_versions(out_dir):
            frag_live.update(snapshot_part_ids(out_dir, sv))
        if replace_pids:
            # rewrite commit: the replaced partitions leave the live
            # manifest atomically with this append (their fragments stay
            # on disk — retained snapshots still reference them)
            missing = set(replace_pids) - frag_live
            if missing:
                raise ValueError(
                    f"replace_pids {sorted(missing)} are not live "
                    "partitions of the current head"
                )
            frag_live -= set(replace_pids)
        for name in fsio.list_files(frag_dir, suffix=".json"):
            pid = int(name[: -len(".json")])
            if pid >= part_offset and pid not in committed:
                fsio.delete_file(f"{frag_dir}/{name}")
    # pyspark's mapInArrow resolves plain column names, which breaks on
    # dotted flat names (period.start) — feed it positional safe names and
    # keep the original names inside the kernel for payload/stats keys
    safe_names = [f"__c{i}" for i in range(len(columns))]
    name_map = dict(zip(safe_names, columns))
    codec_opts = {"archive": True} if profile == "archive" else None
    plan_stats: dict = {}

    if encoded_mode:
        # encoded shuffle (opt-in via shuffle="encoded"): encode map-side
        # per target bucket, exchange the COMPRESSED chunk bytes
        # (~0.25-0.3x of raw), renumber + fragment-commit post-shuffle.
        # Wins when the input is unclustered and the network is the
        # bottleneck (the 100-TB case); trades chunk granularity — each
        # (split, bucket) intersection is its own chunk — so footprint
        # is a few percent worse than the row shuffle on scattered keys.
        bucketed, P = plan_partition_ids(
            df, rows_per_bucket=rows_per_bucket, num_partitions=num_partitions,
            key_counts=key_counts, stats_out=plan_stats, weight_col=weight_col,
        )
        bucketed = bucketed.select(
            *[F.col(f"`{c}`").alias(s) for s, c in zip(safe_names, columns)],
            "__pb",
        )
        # Stage 2 derives part_id from the DATA (the merge kernel segments
        # its input by part_id and flushes fragments per part), so unlike
        # the row path its task count is free: run ~2 tasks per core
        # instead of one per target partition. At P ≫ cores the per-task
        # costs (python worker round-trip, scheduling, shuffle-block
        # granularity — guide §2.2) otherwise dominate the merge stage;
        # grouping bucket g → task g % n2 spreads each hot key's buckets
        # evenly. Pure execution-level grouping: chunk layout, fragments
        # and part ids are identical for any n2.
        n2 = max(1, min(P, spark.sparkContext.defaultParallelism * 2))
        toks2 = partition_tokens(n2)
        tokens = [toks2[g % n2] for g in range(P)]
        sort_names = [
            s for s, c in zip(safe_names, columns)
            if c in ("repo", "path", "commit")
        ]
        try:
            batch_rows = int(
                spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
            )
        except Exception:
            from fhirflat_spark.session import ARROW_BATCH_ROWS as batch_rows
        stage1 = bucketed.mapInArrow(
            encoded_pack_kernel_factory(
                safe_names, tokens, codec_overrides, name_map=name_map,
                codec_opts=codec_opts, part_offset=part_offset,
                sort_names=sort_names, batch_rows=batch_rows,
                bloom_columns=bloom_set, ndv_columns=ndv_set,
                qsk_columns=qsk_set,
            ),
            schema=encoded_shuffle_schema(len(columns)),
        )
        chunks = stage1.repartition(n2, F.col("__tok")).mapInArrow(
            encoded_merge_kernel_factory(
                len(columns), manifest_dir=frag_dir, columns=safe_names,
                codec_overrides=codec_overrides, name_map=name_map,
                codec_opts=codec_opts, batch_rows=batch_rows,
                bloom_columns=bloom_set, ndv_columns=ndv_set,
                qsk_columns=qsk_set, sort_names=sort_names,
            ),
            schema=chunk_schema(len(columns)),
        )
    elif blob_mode:
        # blob-shuffle path (experimental, opt-in via shuffle="blob" —
        # measured slower than the row exchange, kept as the columnar-
        # shuffle seam): bucket ids map-side, pre-pack each
        # split's rows per target partition into Arrow-IPC blobs, shuffle
        # the few fat blob rows, reassemble+sort+encode post-shuffle.
        bucketed, P = plan_partition_ids(
            df, rows_per_bucket=rows_per_bucket, num_partitions=num_partitions,
            key_counts=key_counts, stats_out=plan_stats, weight_col=weight_col,
        )
        bucketed = bucketed.select(
            *[F.col(f"`{c}`").alias(s) for s, c in zip(safe_names, columns)],
            "__pb",
        )
        tokens = partition_tokens(P)
        packed = bucketed.mapInArrow(
            pack_kernel_factory(safe_names, tokens), schema=PACK_SCHEMA
        )
        sort_names = [
            s for s, c in zip(safe_names, columns)
            if c in ("repo", "path", "commit")
        ]
        try:
            batch_rows = int(
                spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
            )
        except Exception:
            from fhirflat_spark.session import ARROW_BATCH_ROWS as batch_rows
        kernel = unpack_encode_kernel_factory(
            safe_names, codec_overrides, skip_parts=skip,
            manifest_dir=frag_dir, name_map=name_map, codec_opts=codec_opts,
            sort_names=sort_names, batch_rows=batch_rows,
            part_offset=part_offset, bloom_columns=bloom_set,
            ndv_columns=ndv_set, qsk_columns=qsk_set,
        )
        chunks = packed.repartition(P, F.col("__tok")).mapInArrow(
            kernel, schema=chunk_schema(len(columns))
        )
    else:
        if shuffle:
            # default shuffled plan: literal-map placement (codegen
            # projection, no broadcast joins) + ONE exchange + Tungsten
            # in-partition sort, then the STREAMING kernel (no Python-side
            # partition materialization — memory-safe at any bucket size).
            # A kernel-side Arrow sort was measured equal-or-slower (the
            # content-column take copies dominate) and holds the whole
            # partition in worker memory, so the JVM sort stays.
            salted, P = plan_salted(
                df, rows_per_bucket=rows_per_bucket,
                num_partitions=num_partitions, key_counts=key_counts,
                stats_out=plan_stats, weight_col=weight_col,
            )
        else:  # layout-preserving: encode splits in place, no exchange
            salted = df
            P = df.rdd.getNumPartitions()
        salted = salted.select(
            *[F.col(f"`{c}`").alias(s) for s, c in zip(safe_names, columns)]
        )
        kernel = encode_kernel_factory(
            safe_names, codec_overrides, skip_parts=skip,
            manifest_dir=frag_dir, name_map=name_map, codec_opts=codec_opts,
            part_offset=part_offset, bloom_columns=bloom_set,
            ndv_columns=ndv_set, qsk_columns=qsk_set,
        )
        chunks = salted.mapInArrow(kernel, schema=chunk_schema(len(columns)))
    if max_new_partitions is not None and P > max_new_partitions:
        # part-id namespace guard (streaming: batch_id * parts_per_batch):
        # silently bleeding into the next range would let a later replay
        # rewrite ANOTHER batch's partitions — fail loudly instead
        raise ValueError(
            f"planned {P} partitions exceed the {max_new_partitions}-wide "
            "part-id namespace; raise parts_per_batch or rows_per_bucket"
        )
    # ONE data-sized job: encode + write chunks; tasks commit their own
    # manifest fragments alongside. partitionBy(part_id) keeps the
    # Iceberg-style partitioned layout that resume prunes/replaces by
    # directory.
    writer = chunks.write.mode(mode).option("compression", "uncompressed")
    if append and overwrite_partitions:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.partitionBy("part_id").parquet(f"{out_dir}/chunks")
    meta_rows = load_fragments(frag_dir)
    if frag_live is not None:
        # append commit = head-reachable history + this run's range.
        # Fragments of rolled-back pids stay on disk for rollback-forward
        # but must not merge into the new manifest (silent resurrection).
        meta_rows = [
            r for r in meta_rows
            if r["part_id"] >= part_offset or r["part_id"] in frag_live
        ]
    new_deletes = None
    if delete_keys is not None:
        # upsert: shadow-delete matching keys in PRE-EXISTING partitions
        # (below_part = this append's offset — the sequence scope), in
        # the SAME snapshot commit as the appended data. File name keyed
        # by offset: a retried append overwrites its own keys file.
        if not append:
            raise ValueError("delete_keys (upsert) requires append=True")
        from fhirflat_spark.manifest import write_delete_keys

        dcol, dvals = delete_keys
        dname, _ = write_delete_keys(
            spark, out_dir, dcol, dvals, f"u{part_offset:010d}.parquet"
        )
        new_deletes = [
            {"file": dname, "column": dcol, "below_part": part_offset}
        ]
    if delete_positions is not None:
        # predicate UPDATE: position-delete the matched rows' old copies
        # in the SAME snapshot commit as their rewritten images (the
        # appended partitions sit at/above part_offset — fresh addresses
        # a position file captured beforehand can never hit). Offset-
        # keyed name: a retried append replaces its own positions file.
        if not append:
            raise ValueError("delete_positions requires append=True")
        pname = f"w{part_offset:010d}.parquet"
        (delete_positions
         .select(F.col("part_id").cast("int"),
                 F.col("chunk_seq").cast("int"),
                 F.col("row_idx").cast("int"))
         .distinct()
         .write.mode("overwrite")
         .parquet(f"{out_dir}/deletes/{pname}"))
        new_deletes = (new_deletes or []) + [
            {"file": pname, "column": None, "positional": True}
        ]
    manifest_stats = write_manifest(spark, out_dir, meta_rows,
                                    new_deletes=new_deletes, branch=branch)
    if branch is not None:
        # staged commit: the summary and merged key-count stats are
        # MAIN-visible state — publish_branch patches the summary from
        # the ref's recorded totals; stats fragments are skipped (stale
        # counts are safe by design, and drop_branch must not leak them)
        seconds = time.time() - t0
        return EncodeResult(
            out_dir=out_dir,
            num_partitions=manifest_stats["n_partitions"],
            seconds=seconds,
            rows=manifest_stats["rows"],
            raw_bytes=manifest_stats["raw_bytes"],
            encoded_bytes=manifest_stats["encoded_bytes"],
            shuffled=bool(shuffle),
        )
    if plan_stats.get("key_counts") and not plan_stats.get("caller_counts"):
        # persist SCAN-DERIVED counts only (caller-provided stats are the
        # caller's to maintain). Fragment keyed by part_offset: a full
        # encode/resume owns the table (fresh=True clears old fragments);
        # an append/replayed batch atomically replaces only its own
        # fragment — idempotent under retries.
        from fhirflat_spark.manifest import write_key_counts

        write_key_counts(out_dir, plan_stats["key_counts"],
                         label=f"{part_offset:012d}", fresh=not append)
    seconds = time.time() - t0
    result = EncodeResult(
        out_dir=out_dir,
        num_partitions=manifest_stats["n_partitions"] if append else P,
        seconds=seconds,
        rows=manifest_stats["rows"],
        raw_bytes=manifest_stats["raw_bytes"],
        encoded_bytes=manifest_stats["encoded_bytes"],
        shuffled=bool(shuffle),
    )
    write_summary(
        spark, out_dir, result, columns,
        spark_schema=df.select(*[F.col(f"`{c}`") for c in columns]).schema.json(),
        dataset_sha=manifest_stats["dataset_sha256"],
        extra=(
            ({"bloom_columns": sorted(bloom_set)} if bloom_set else {})
            | ({"ndv_columns": sorted(ndv_set)} if ndv_set else {})
            | ({"quantile_columns": sorted(qsk_set)} if qsk_set else {})
        ) or None,
    )
    return result


def append_table(
    df: DataFrame,
    out_dir: str,
    rows_per_bucket: int = 250_000,
    num_partitions: int | None = None,
    key_counts: list[tuple] | None = None,
    shuffle: bool | str = True,
    profile: str = "balanced",
    delete_keys: tuple | None = None,
    delete_positions: DataFrame | None = None,
    weight_col: str | None = None,
    branch: str | None = None,
    ndv_columns: list[str] | None = None,
    quantile_columns: list[str] | None = None,
    replace_pids: set[int] | None = None,
) -> EncodeResult:
    """Incrementally append ``df`` to an EXISTING encoded dataset — the
    daily-ingest pattern at 100 TB: new rows become NEW partitions
    (part ids offset past every existing one), the manifest re-merges old
    + new fragments, and the dataset checksum/summary update to cover the
    whole table. Existing chunk files are never touched, so concurrent
    readers keep a consistent view until the summary swap.

    Schema evolution (Iceberg add-column semantics): the delta may ADD
    columns — they append to the dataset's column list (old columns keep
    their positional payload fields, so existing chunks stay readable
    as-is) and old partitions decode as typed nulls for them. The delta
    may also OMIT existing columns — they are null-filled from the
    dataset schema. A shared column whose Spark type differs is an
    error: silent coercion at 100 TB is how tables rot. When no
    ``key_counts`` are given, the append batch's per-key counts are
    scanned (cost proportional to the DELTA, not the table), used to
    plan THIS append's buckets, and persisted as this offset's stats
    fragment — so merged statistics keep tracking the whole dataset
    across appends without rescanning it, and a retried append replaces
    its own fragment instead of double-counting. Returned totals cover
    the WHOLE dataset after the append."""
    # Planning deliberately counts only the DELTA (cost proportional to
    # the append, never the table): merged totals from load_key_counts
    # would size buckets as if the whole table were in this append and
    # over-fragment small deltas. The persisted merged stats serve
    # whole-table observability (tests/test_pipeline.py) and future
    # full re-plans, not per-append placement.
    from fhirflat_spark.manifest import (
        completed_partitions,
        read_summary,
        write_key_counts,
    )

    spark = df.sparkSession
    summary = read_summary(spark, out_dir)
    old_cols = list(summary["columns"])
    added = [c for c in df.columns if c not in old_cols]
    missing = [c for c in old_cols if c not in df.columns]
    evolved = bool(added or missing) or list(df.columns) != old_cols
    if branch is not None and (added or missing):
        # staged appends may not evolve the schema: the columns list and
        # spark_schema live in the MAIN-visible summary, so a staged
        # evolution would leak unpublished columns to main readers
        raise ValueError(
            f"branch {branch!r} append adds/omits columns "
            f"({added or missing}); schema evolution must commit to main"
        )
    if summary.get("spark_schema"):
        old_schema = T.StructType.fromJson(json.loads(summary["spark_schema"]))
        by_name = {f.name: f for f in old_schema.fields}
        for c in df.columns:
            if c in by_name and df.schema[c].dataType != by_name[c].dataType:
                raise ValueError(
                    f"append column {c!r} type {df.schema[c].dataType} != "
                    f"dataset type {by_name[c].dataType} — evolve types "
                    "explicitly (transcode), not by append coercion"
                )
        for c in missing:
            df = df.withColumn(c, F.lit(None).cast(by_name[c].dataType))
        if evolved:
            # stable positional payload mapping: old columns keep their
            # indices, added columns take fresh trailing ones — existing
            # chunks stay readable and decode fills typed nulls
            df = df.select(*[F.col(f"`{c}`") for c in old_cols + added])
    elif evolved:
        raise ValueError(
            f"append columns {list(df.columns)} != dataset columns "
            f"{old_cols} and the dataset records no spark_schema to "
            "evolve against"
        )
    from fhirflat_spark.manifest import FORMAT_VERSION

    fv = summary.get("format_version", 0)
    if fv != FORMAT_VERSION:
        # appending current-format chunks into an older-format dataset
        # would mix codec blob formats inside one table (pre-v4 fsst
        # chunks are unreadable by this engine) — upgrade first
        raise ValueError(
            f"dataset format_version {fv} != engine {FORMAT_VERSION}; "
            "upgrade the dataset first (compact_table/transcode_table "
            "with this engine — or re-encode from source if it contains "
            "chunks this engine's codecs no longer read)"
        )
    existing = completed_partitions(spark, out_dir)
    # mint ids past every partition any RETAINED snapshot references,
    # not just the current manifest: after a rollback the dropped
    # partitions are still time-travel-readable, and reusing their ids
    # (dynamic overwrite clears the dir) would silently rewrite that
    # history. Ids from a crashed append are in NO snapshot — those stay
    # reusable, which is what makes a retried append idempotent.
    from fhirflat_spark.manifest import all_snapshot_part_ids

    top = max([*existing, *all_snapshot_part_ids(out_dir)], default=None)
    offset = (top + 1) if top is not None else 0
    delta_stats: list[tuple] | None = None
    if key_counts is None and "repo" in df.columns and weight_col is None:
        # same driver-memory ceiling as the placement scan: keep the
        # top-``SALT_STATS_CAP`` heaviest delta keys exact (deterministic
        # order); tail keys place via the planner's "o:" fallback bucket
        # and the persisted delta stats stay O(cap), not O(#keys)
        rows = (df.groupBy("repo").count()
                .orderBy(F.desc("count"), F.col("`repo`"))
                .limit(SALT_STATS_CAP + 1).collect())
        if len(rows) > SALT_STATS_CAP:
            rows = rows[:SALT_STATS_CAP]
        delta_stats = [(r[0], r["count"]) for r in rows]
        key_counts = delta_stats
    res = encode_table(
        df, out_dir, rows_per_bucket=rows_per_bucket,
        num_partitions=num_partitions, key_counts=key_counts,
        shuffle=shuffle, profile=profile, append=True, part_offset=offset,
        # appended chunks keep indexing the columns the dataset blooms
        # (added columns can opt in only via a fresh encode)
        bloom_columns=[c for c in summary.get("bloom_columns", ())
                       if c in df.columns],
        delete_keys=delete_keys,
        delete_positions=delete_positions,
        branch=branch,
        ndv_columns=ndv_columns,
        quantile_columns=quantile_columns,
        replace_pids=replace_pids,
        # byte-weighted delta placement: the planner runs its own
        # count+sum scan; row-count stats are NOT persisted for weighted
        # appends (equivalent-row weights would pollute merged row totals)
        weight_col=weight_col,
        # a RETRIED append reuses the same offset (the manifest was not
        # merged before the crash); dynamic partition overwrite makes the
        # retry replace exactly its own partition dirs instead of
        # appending duplicate chunk files next to the crashed attempt's
        overwrite_partitions=True,
    )
    if delta_stats is not None and branch is None:
        # persist only after a successful MAIN append (a staged append's
        # stats would leak into main observability and outlive drop_branch)
        write_key_counts(
            out_dir,
            [("n:" if k is None else f"v:{k}", c) for k, c in delta_stats],
            label=f"{offset:012d}",
        )
    return res


def upsert_rows(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    rows_per_bucket: int = 250_000,
    shuffle: bool | str = True,
    profile: str = "balanced",
) -> EncodeResult:
    """MERGE/upsert by key — ONE atomic snapshot commit that appends
    ``df``'s rows as new partitions and shadow-deletes every
    pre-existing row whose ``key_col`` matches (a scoped equality-delete
    entry committed in the same sidecar as the data, so readers never
    see the intermediate delete-without-insert or insert-with-duplicate
    states). Existing chunk files are untouched; the rewrite happens at
    the next compaction, the Iceberg merge-on-read trade. Keys present
    only in ``df`` are plain inserts; matched keys read as ``df``'s
    version afterwards."""
    return append_table(
        df, out_dir, rows_per_bucket=rows_per_bucket, shuffle=shuffle,
        profile=profile,
        delete_keys=(key_col, df.select(key_col).distinct()),
    )


APPLY_UPSERT_OPS = frozenset({"insert", "update", "upsert", "I", "U"})
APPLY_DELETE_OPS = frozenset({"delete", "D"})


def apply_changes(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    op_col: str = "_op",
    rows_per_bucket: int = 250_000,
    shuffle: bool | str = True,
    profile: str = "balanced",
) -> dict:
    """SQL ``MERGE`` / CDC apply in ONE snapshot commit: ``df`` carries
    an op column (``insert``/``update``/``upsert``/``I``/``U`` = write
    this row's image, ``delete``/``D`` = remove the key) and the whole
    batch lands atomically — non-delete rows append as new partitions
    while a single scoped equality-delete entry shadows every touched
    key's pre-existing copy, so a reader never observes a half-applied
    batch (the two-commit delete-then-upsert shape has a window where
    deleted keys are gone but updates haven't landed; this has none).
    A pure-delete batch commits just the delete entry.

    Contract (validated delta-proportionally, never scanning the
    table): exactly one row per key in the batch — resolve multi-event
    CDC streams to their latest image upstream — and no NULL keys
    (equality deletes can't address them). Insert vs update is not
    distinguished against the table (both write the image; matching is
    the shadow delete's job) — the Iceberg merge-on-read trade, same as
    :func:`upsert_rows`. Unknown op values raise.

    Returns {"inserts", "deletes", "snapshot"}: upserted row-images,
    delete ops applied, and the table's snapshot after the commit (an
    empty batch commits nothing and returns the current snapshot)."""
    from fhirflat_spark.manifest import current_snapshot, delete_rows

    spark = df.sparkSession
    if key_col not in df.columns or op_col not in df.columns:
        raise ValueError(
            f"apply_changes needs {key_col!r} and {op_col!r} in the batch"
        )
    ops = [r[0] for r in df.select(op_col).distinct().collect()]
    bad = [o for o in ops if o not in APPLY_UPSERT_OPS | APPLY_DELETE_OPS]
    if bad:
        raise ValueError(
            f"unknown op values {sorted(map(repr, bad))}: expected "
            f"{sorted(APPLY_UPSERT_OPS)} or {sorted(APPLY_DELETE_OPS)}"
        )
    if df.where(F.col(key_col).isNull()).limit(1).count():
        raise ValueError(f"NULL {key_col!r} in the change batch — "
                         "equality deletes cannot address NULL keys")
    if (df.groupBy(key_col).count().where(F.col("count") > 1)
            .limit(1).count()):
        raise ValueError(
            f"duplicate {key_col!r} in the change batch — one row per "
            "key (resolve CDC streams to their latest image upstream)"
        )
    data = (
        df.where(F.col(op_col).isin(list(APPLY_UPSERT_OPS))).drop(op_col)
    )
    n_ins = int(data.count())
    touched = df.select(key_col).distinct()
    n_del = int(df.where(
        F.col(op_col).isin(list(APPLY_DELETE_OPS))).count())
    if n_ins:
        append_table(
            data, out_dir, rows_per_bucket=rows_per_bucket,
            shuffle=shuffle, profile=profile,
            delete_keys=(key_col, touched),
        )
    elif n_del:
        delete_rows(spark, out_dir, key_col, touched)
    return {"inserts": n_ins, "deletes": n_del,
            "snapshot": current_snapshot(out_dir)}
