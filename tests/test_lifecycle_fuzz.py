"""Table-lifecycle fuzzer: a deterministic random interleaving of
append / named-sink append / upsert / equality delete / position delete
/ rollback / maintain / WAP / tag against a Python model of the
expected row set. After EVERY operation the decoded table must equal
the model; metadata-only counts must agree when servable; the NDV and
DDSketch-quantile metadata answers, WHEN served, must sit within their
guaranteed error of the model (they may refuse — deletes, staged
history — but must never lie, and compaction must restore service
with the deletes materialized); every
recorded commit's CDF (``table_changes``) must replay the previous
model state into the new one; chunk checksums re-verify; and at the end
every retained snapshot AND surviving tag of the current lineage must
time-travel back to the model state recorded when it was committed.
Catches cross-feature interactions the per-feature suites can't (e.g.
delete-scope vs rollback vs compaction ordering — this file caught the
fragment-lifetime bug the per-feature suites missed)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from fhirflat_spark.changes import table_changes
from fhirflat_spark.decode import decode_table, verify_table
from fhirflat_spark.encode import append_table, encode_table, upsert_rows
from fhirflat_spark.maintenance import maintain_table
from fhirflat_spark.manifest import (
    aggregate_from_metadata,
    create_tag,
    current_snapshot,
    delete_rows,
    delete_rows_at,
    list_refs,
    list_snapshots,
    rollback,
)

COLS = ["doc_id", "lang", "n"]


def _df(spark, rows):
    return spark.createDataFrame(
        [(int(i), l, int(n)) for i, l, n in rows], COLS
    )


def _decode_rows(spark, out):
    return sorted(
        tuple(r) for r in decode_table(spark, out).select(*COLS).collect()
    )


def _model_rows(model):
    return sorted(model.values())


def _mk_rows(rng, ids):
    return [(i, rng.choice(["en", "fr", "de"]), rng.randrange(1000))
            for i in ids]


_SEEDS = [
    int(s) for s in __import__("os").environ.get(
        "SPARK_GRAFT_FUZZ_SEEDS", "7,23"
    ).split(",")
]


@pytest.mark.parametrize("seed", _SEEDS)
def test_lifecycle_fuzz(spark, tmp_path, seed):
    from fhirflat_spark.sources.datasource import register

    register(spark)
    rng = random.Random(seed)
    out = str(tmp_path / f"fz{seed}")

    from fhirflat_spark.ndv import ndv_from_metadata
    from fhirflat_spark.quantiles import ALPHA, quantile_from_metadata

    next_id = 200
    base = _mk_rows(rng, range(next_id))
    model = {r[0]: r for r in base}
    encode_table(_df(spark, base), out, rows_per_bucket=50,
                 ndv_columns=["doc_id"], quantile_columns=["n"])
    # non-vacuous from step 0: both sketches serve on a clean table
    assert ndv_from_metadata(out, "doc_id") is not None
    assert quantile_from_metadata(out, "n", 0.5) is not None

    def check_sketches(where):
        """Sketch answers may refuse under deletes/mixed history, but a
        SERVED answer must sit within its guarantee of the model."""
        nd = ndv_from_metadata(out, "doc_id")
        if nd is not None:
            exact = len(model)
            assert abs(nd - exact) <= max(1, 0.05 * exact), (
                f"{where} ndv={nd} exact={exact}")
        for q in (0.1, 0.5, 0.9):
            est = quantile_from_metadata(out, "n", q)
            if est is not None and model:
                vals = sorted(v[2] for v in model.values())
                true = vals[int(q * (len(vals) - 1))]
                assert abs(est - true) <= ALPHA * abs(true) + 1e-9, (
                    f"{where} q={q} est={est} true={true}")
        # encoded-domain group-by: exact vs the model when servable,
        # REFUSED (never silently wrong) while deletes are active
        from fhirflat_spark.encoded_exec import (
            count_encoded,
            group_count_encoded,
        )
        from fhirflat_spark.manifest import active_delete_files

        try:
            got = {
                r["lang"]: r["cnt"]
                for r in group_count_encoded(spark, out, "lang").collect()
            }
            # filtered count through the full pushdown tower (zones +
            # row masks) against the model, with a random predicate
            lang = rng.choice(["en", "fr", "de"])
            lo = rng.randrange(0, 1000)
            fcnt = count_encoded(
                spark, out,
                where=[("lang", "eq", lang), ("n", "ge", lo)],
            )
        except ValueError:
            assert active_delete_files(out), (
                f"{where}: encoded group-by refused without active deletes"
            )
        else:
            import collections

            exp = collections.Counter(v[1] for v in model.values())
            assert got == dict(exp), (
                f"{where}: encoded group-by diverged from the model"
            )
            fexp = sum(
                1 for v in model.values() if v[1] == lang and v[2] >= lo
            )
            assert fcnt == fexp, (
                f"{where}: filtered count_encoded {fcnt} != model {fexp} "
                f"(lang={lang}, n>={lo})"
            )
        # zone-threshold top-k NEVER refuses — it falls back to the
        # exact unpruned scan (merge-on-read) under deletes, so it must
        # equal the model at every step of the lifecycle
        from fhirflat_spark.encoded_exec import topk_rows_encoded

        got_tk = [
            tuple(r) for r in topk_rows_encoded(
                spark, out, "n", 5, "doc_id").collect()
        ]
        exp_tk = sorted(model.values(), key=lambda r: (-r[2], r[0]))[:5]
        assert got_tk == [tuple(r) for r in exp_tk], (
            f"{where}: topk_rows_encoded diverged from the model"
        )
        # filtered top-k: the WHERE-composed threshold must stay exact
        # across every lifecycle state too
        got_tkw = [
            tuple(r) for r in topk_rows_encoded(
                spark, out, "n", 4, "doc_id",
                where=[("lang", "eq", "en")]).collect()
        ]
        exp_tkw = sorted(
            (r for r in model.values() if r[1] == "en"),
            key=lambda r: (-r[2], r[0]),
        )[:4]
        assert got_tkw == [tuple(r) for r in exp_tkw], (
            f"{where}: filtered topk_rows_encoded diverged from the model"
        )
    # history of (version, model snapshot) for the CURRENT lineage
    history = [(current_snapshot(out), dict(model))]
    tags: dict[str, dict] = {}

    def record():
        prev_v, prev_m = history[-1]
        history.append((current_snapshot(out), dict(model)))
        cur_v, cur_m = history[-1]
        if cur_v <= prev_v:
            return
        # CDF replay: the net changes between the two commits, applied
        # to the previous model state, must land exactly on the new one
        # (exercises both the append-only fast path and the rewritten-
        # history exceptAll path — rollback records trigger the latter)
        rows = {tuple(r) for r in prev_m.values()}
        ch = (
            table_changes(spark, out, prev_v, cur_v)
            .select(*COLS, "_change_type").collect()
        )
        for r in ch:
            if r["_change_type"] == "delete":
                rows.discard((r["doc_id"], r["lang"], r["n"]))
        for r in ch:
            if r["_change_type"] == "insert":
                rows.add((r["doc_id"], r["lang"], r["n"]))
        assert sorted(rows) == _model_rows(cur_m), (
            f"CDF replay {prev_v}->{cur_v} diverged from the model"
        )
        # streaming-CDF parity: every streamable window's reader output
        # must match the batch fast path (inserts multiset-equal,
        # deletes set-equal); non-streamable windows (rollback rewrite,
        # positional deletes) must refuse — never emit wrong deltas
        from fhirflat_spark.sources.datasource import (
            FhirflatChangeFeedReader,
        )

        try:
            rdr = FhirflatChangeFeedReader({"path": out}, None)
            srows = []
            for p in rdr.partitions({"snapshot": prev_v},
                                    {"snapshot": cur_v}):
                for rb in rdr.read(p):
                    srows.extend(
                        tuple(r.values()) for r in rb.to_pylist()
                    )
        except RuntimeError:
            return  # batch-only window shape, refused loudly
        s_ins = sorted(r[:-1] for r in srows if r[-1] == "insert")
        s_del = {r[:-1] for r in srows if r[-1] == "delete"}
        b_ins = sorted(
            (r["doc_id"], r["lang"], r["n"]) for r in ch
            if r["_change_type"] == "insert"
        )
        b_del = {
            (r["doc_id"], r["lang"], r["n"]) for r in ch
            if r["_change_type"] == "delete"
        }
        assert s_ins == b_ins and s_del == b_del, (
            f"streaming CDF {prev_v}->{cur_v} diverged from batch"
        )

    ops = ["append", "sink", "upsert", "delete", "posdelete",
           "rollback", "maintain", "wap", "tag", "apply", "binpack",
           "delwhere", "analyze", "updwhere"]
    weights = [3, 2, 3, 3, 2, 1, 1, 2, 1, 2, 2, 2, 1, 2]
    trace = []
    for step in range(16):
        op = rng.choices(ops, weights)[0]
        trace.append(op)
        if op == "append":
            ids = range(next_id, next_id + rng.randrange(20, 60))
            next_id = ids.stop
            rows = _mk_rows(rng, ids)
            append_table(_df(spark, rows), out, rows_per_bucket=50)
            model.update({r[0]: r for r in rows})
            record()
        elif op == "sink":
            # the named Spark sink commits through the same snapshot
            # layer as append_table — interleaving the two is the seam
            ids = range(next_id, next_id + rng.randrange(15, 45))
            next_id = ids.stop
            rows = _mk_rows(rng, ids)
            (_df(spark, rows).repartition(rng.randrange(1, 4))
             .write.format("fhirflat").mode("append").save(out))
            model.update({r[0]: r for r in rows})
            record()
        elif op == "posdelete":
            live = sorted(model)
            doomed = rng.sample(live, min(len(live), rng.randrange(3, 12)))
            if not doomed:
                continue  # empty table: nothing addressable
            pos = (
                decode_table(spark, out, with_positions=True)
                .where(F.col("doc_id").isin([int(d) for d in doomed]))
                .select(
                    F.col("__part_id").alias("part_id"),
                    F.col("__chunk_seq").alias("chunk_seq"),
                    F.col("__row_idx").alias("row_idx"),
                )
            )
            delete_rows_at(spark, out, pos)
            for k in doomed:
                model.pop(k, None)
            record()
        elif op == "binpack":
            # partial in-place compaction: model unchanged, ONE commit,
            # history stays addressable (record() replays the CDF net —
            # a binpack window must net to ZERO row changes and the
            # streaming reader must refuse it loudly, never emit deltas)
            from fhirflat_spark.maintenance import binpack_partitions

            rep = binpack_partitions(
                spark, out, rows_per_bucket=50,
                min_fill=rng.choice([0.5, 1.0]),
            )
            if rep["packed"]:
                record()
        elif op == "tag":
            name = f"t{step}"
            create_tag(out, name)
            tags[name] = dict(model)
        elif op == "upsert":
            live = sorted(model)
            touch = rng.sample(live, min(len(live), rng.randrange(10, 40)))
            fresh = range(next_id, next_id + rng.randrange(0, 15))
            next_id = fresh.stop
            rows = _mk_rows(rng, [*touch, *fresh])
            upsert_rows(_df(spark, rows), out, "doc_id", rows_per_bucket=50)
            model.update({r[0]: r for r in rows})
            record()
        elif op == "apply":
            # single-commit MERGE (apply_changes): update some live
            # keys, insert fresh ones, delete others — one atomic
            # commit mixing all three through the op column
            from fhirflat_spark.encode import apply_changes

            live = sorted(model)
            touch = rng.sample(live, min(len(live), rng.randrange(5, 20)))
            k_del = rng.randrange(0, len(touch) // 2 + 1)
            doomed, updated = touch[:k_del], touch[k_del:]
            fresh = range(next_id, next_id + rng.randrange(0, 12))
            next_id = fresh.stop
            up_rows = _mk_rows(rng, [*updated, *fresh])
            batch = [(i, l, n, "upsert") for i, l, n in up_rows] + [
                (d, "xx", 0, "delete") for d in doomed
            ]
            if not batch:
                continue
            bdf = spark.createDataFrame(
                [(int(i), l, int(n), o) for i, l, n, o in batch],
                COLS + ["_op"],
            )
            apply_changes(bdf, out, "doc_id", rows_per_bucket=50)
            model.update({r[0]: r for r in up_rows})
            for d in doomed:
                model.pop(d, None)
            record()
        elif op == "delwhere":
            # predicate DELETE: metadata drops for entailed partitions +
            # positional deletes for straddlers in ONE commit; the model
            # applies the same predicate in Python. The CDF replay in
            # record() exercises the view-diff path (a drop window is
            # not append-only) and the streaming reader must refuse it.
            from fhirflat_spark.maintenance import delete_where

            def _pred():
                return rng.choice([
                    ("n", "lt", rng.randrange(0, 120)),
                    ("n", "ge", rng.randrange(850, 1000)),
                    ("lang", "eq", rng.choice(["en", "de", "fr", "xx"])),
                ])

            # unit pred / one OR clause / CNF mixing both — the model
            # evaluates the identical CNF in Python
            shape = rng.randrange(3)
            if shape == 0:
                clauses = [[_pred()]]
                where = clauses[0][0]
            elif shape == 1:
                clauses = [[_pred(), _pred()]]
                where = [clauses[0]]
            else:
                clauses = [[_pred()], [_pred(), _pred()]]
                where = [clauses[0][0], clauses[1]]
            delete_where(spark, out, where)

            def _ev(p, r):
                col, o, v = p
                x = r[2] if col == "n" else r[1]
                return {"lt": x < v, "ge": x >= v, "eq": x == v}[o]

            model = {
                k: r for k, r in model.items()
                if not all(any(_ev(p, r) for p in cl) for cl in clauses)
            }
            record()
        elif op == "updwhere":
            # predicate UPDATE: matched rows' new images append while
            # old copies position-delete in ONE commit; the model
            # applies the same CASE. Window is append-only → CDF fast
            # path; the streaming reader refuses positional deletes.
            from fhirflat_spark.maintenance import update_where

            lo = rng.randrange(0, 200)
            if rng.random() < 0.5:
                w = ("n", "lt", lo)

                def _hit(r):
                    return r[2] < lo
            else:  # OR clause: (n < lo OR lang = L)
                lang = rng.choice(["en", "de", "fr"])
                w = [[("n", "lt", lo), ("lang", "eq", lang)]]

                def _hit(r, _l=lang):
                    return r[2] < lo or r[1] == _l
            rep = update_where(spark, out, w,
                               {"n": "n + 1000"}, rows_per_bucket=50)
            model = {
                k: (r[0], r[1], r[2] + 1000 if _hit(r) else r[2])
                for k, r in model.items()
            }
            if rep["snapshot"] is not None:
                record()
        elif op == "analyze":
            # stats backfill mid-lifecycle: extend NDV tracking to lang
            # with a metadata-only commit; refuses under active deletes
            # (never lies), and a served post-backfill estimate must sit
            # within its guarantee of the model. The CDF replay in
            # record() must see an EMPTY window.
            from fhirflat_spark.maintenance import analyze_table
            from fhirflat_spark.manifest import active_delete_files

            try:
                rep = analyze_table(spark, out, ndv_columns=["lang"])
            except ValueError:
                assert active_delete_files(out), (
                    f"seed={seed} step={step}: analyze refused without "
                    "active deletes"
                )
                continue
            nd = ndv_from_metadata(out, "lang")
            if nd is not None and model:
                exact = len({v[1] for v in model.values()})
                assert abs(nd - exact) <= max(1, 0.05 * exact), (
                    f"seed={seed} step={step} analyze ndv={nd} "
                    f"exact={exact}"
                )
            if rep["snapshot"] is not None:
                record()
        elif op == "delete":
            live = sorted(model)
            doomed = rng.sample(live, min(len(live), rng.randrange(5, 30)))
            doomed.append(next_id + 10_000)  # non-existent key: no-op
            delete_rows(spark, out, "doc_id", doomed)
            for k in doomed:
                model.pop(k, None)
            record()
        elif op == "rollback":
            v, snap = rng.choice(history)
            rollback(spark, out, v)
            model = dict(snap)
            record()
        elif op == "wap":
            # write-audit-publish: stage on a branch (main must not move),
            # audit the staged view, then publish or abandon
            from fhirflat_spark.manifest import drop_branch, publish_branch

            ids = range(next_id, next_id + rng.randrange(10, 30))
            next_id = ids.stop
            rows = _mk_rows(rng, ids)
            append_table(_df(spark, rows), out, rows_per_bucket=50,
                         branch="audit")
            assert _decode_rows(spark, out) == _model_rows(model), (
                f"seed={seed} step={step} staged commit moved main"
            )
            staged = sorted(
                tuple(r)
                for r in decode_table(spark, out, snapshot="audit")
                .select(*COLS).collect()
            )
            assert staged == sorted([*model.values(), *rows]), (
                f"seed={seed} step={step} audit view wrong"
            )
            if rng.random() < 0.6:
                publish_branch(out, "audit")
                model.update({r[0]: r for r in rows})
                record()
            else:
                drop_branch(out, "audit")  # abandoned: model unchanged
        elif op == "maintain":
            # sometimes the compaction is a sort-order / z-order rewrite
            # (content must stay identical either way)
            ob = rng.choice([None, ["doc_id"], ["lang", "doc_id"]])
            maintain_table(spark, out, rows_per_bucket=50,
                           keep_snapshots=2, order_by=ob,
                           zorder=bool(ob) and len(ob) > 1)
            # compaction swap / expiry may reset or trim history — the
            # recorded lineage is no longer addressable; re-pin
            history = [(current_snapshot(out), dict(model))]
            # a compaction swap resets refs too (history traded for
            # layout); tags that survived expiry must still resolve
            tags = {n: m for n, m in tags.items() if n in list_refs(out)}
        assert _decode_rows(spark, out) == _model_rows(model), (
            f"seed={seed} step={step} trace={trace}"
        )
        agg = aggregate_from_metadata(out, ["doc_id"])
        if agg is not None:
            assert agg["rows"] == len(model), (
                f"seed={seed} step={step} trace={trace}"
            )
        check_sketches(f"seed={seed} step={step} trace={trace}")
        if step % 5 == 4:
            bad = verify_table(spark, out).where(~F.col("ok")).count()
            assert bad == 0, f"seed={seed} step={step} trace={trace}"

    # time travel: every recorded snapshot of the current lineage must
    # reproduce the model state at its commit
    retained = {
        int(r["version"]) for r in list_snapshots(spark, out).collect()
    }
    for v, snap in history:
        if v not in retained:
            continue  # expired by maintain
        got = sorted(
            tuple(r)
            for r in decode_table(spark, out, snapshot=v)
            .select(*COLS).collect()
        )
        assert got == sorted(snap.values()), (
            f"seed={seed} snapshot={v} trace={trace}"
        )
    # surviving tags must still decode the state they were minted on,
    # through any interleaving of deletes / rollbacks / expiry
    for name, snap in tags.items():
        got = sorted(
            tuple(r)
            for r in decode_table(spark, out, snapshot=name)
            .select(*COLS).collect()
        )
        assert got == sorted(snap.values()), (
            f"seed={seed} tag={name} trace={trace}"
        )
