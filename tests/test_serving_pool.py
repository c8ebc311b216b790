"""Forked multiprocess tier serving (serving_pool.TierProcPool): the
pool must be observably IDENTICAL to the in-process engine across the
whole query surface, before and after mutation broadcasts — same
differential bar as the tier itself (tests/test_mutate_tier.py).

Reference parity note: the reference serves queries from N forked
DuckDB worker processes fed by Redis lists (reference workers.py:23-56)
— processes, not threads, exactly because its query path is CPU-bound
in the worker. The pool is the Spark-resident counterpart; mutations
stay serialized through the parent like the reference's single manager
process (workers.py:45-56).
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.test_mutate_tier import QUERY_BATTERY, SCRIPT, _mk_engine, _store_state


def _mk_pool(engine, n=2):
    from bikidata_spark.serving_pool import TierProcPool

    return TierProcPool(engine, n)


@pytest.fixture()
def warm_engine(spark):
    eng = _mk_engine(spark, tier=True)
    # warm everything the fork snapshots: tier, fts mirror
    eng.query({"filters": [{"p": "fts", "o": "alpha"}], "size": 1})
    return eng


def test_pool_query_differential(spark, warm_engine):
    eng = warm_engine
    pool = _mk_pool(eng)
    try:
        for opts in QUERY_BATTERY:
            o = {**opts, "use_cache": False}
            got = pool.query(dict(o))
            want = eng.query(dict(o))
            if got is None:  # bail — allowed only where the tier bails too
                assert eng._local_tier().try_query(eng, o, eng.local_tier_fts_rows) is None
            else:
                assert got == want, f"diverged on {opts}"
        st = pool.stats()
        assert st["worker_errors"] == 0
    finally:
        pool.close()


def test_pool_mutation_broadcast_differential(spark, warm_engine):
    """Run the full mutation script; after every successful step the
    pool's answers must equal a distributed control engine's."""
    eng = warm_engine
    plain = _mk_engine(spark, tier=False)
    pool = _mk_pool(eng)
    try:
        for action, data, are_hashes in SCRIPT:
            eng._last_tier_delta = None
            a = eng.mutate(action, [dict(d) for d in data], are_hashes=are_hashes)
            b = plain.mutate(action, [dict(d) for d in data], are_hashes=are_hashes)
            assert a == b
            if "error" in a:
                continue
            delta = eng._last_tier_delta
            assert delta is not None and delta["new_tier"] is not None
            pool.apply_mutation(delta)
        assert _store_state(eng) == _store_state(plain)
        for opts in QUERY_BATTERY:
            if opts.get("paths"):
                continue  # post-mutation paths bail by design (below)
            o = {**opts, "use_cache": False}
            got = pool.query(dict(o))
            want = plain.query(dict(o))
            if got is None:
                assert eng._local_tier().try_query(eng, o, eng.local_tier_fts_rows) is None
            else:
                assert got == want, f"diverged on {opts}"
        # the fts battery entries went through the incremental-rows
        # broadcast (the script inserts new literals): pin one directly
        got = pool.query({"filters": [{"p": "fts", "o": "zulu"}], "size": 25, "use_cache": False})
        want = plain.query({"filters": [{"p": "fts", "o": "zulu"}], "size": 25, "use_cache": False})
        assert got is not None and got == want
    finally:
        pool.close()


def test_pool_paths_served_after_mutation(spark, warm_engine):
    """paths queries keep serving FROM THE FORK across mutations: the
    mutation broadcast patches the fork-resident hierarchy maps
    (serving_pool._patch_child_paths ← plans/query.patch_paths_edges),
    including mutations that edit the walked hierarchy itself. Results
    must match a distributed control engine after every step."""
    eng = warm_engine
    plain = _mk_engine(spark, tier=False)
    popts = {
        "filters": [{"p": "id", "o": "<m/20>"}],
        "paths": ["<p/peer>"],
        "size": 1,
        "use_cache": False,
    }
    eng.query(dict(popts))  # cache the hierarchy map pre-fork
    pool = _mk_pool(eng)
    script = [
        # off-hierarchy mutation: chains unchanged
        ("insert", [{"s": "<pb/1>", "p": "<p/x>", "o": "<t/0>"}]),
        # edits ON the walked hierarchy: new parent edge for a chain
        # node, then an edge delete (m/20's chain runs 27 → 34 → …)
        ("insert", [{"s": "<m/27>", "p": "<p/peer>", "o": "<pb/root>"}]),
        ("delete", [{"s": "<m/34>", "p": "<p/peer>", "o": "<m/41>", "g": "<g/1>"}]),
    ]
    try:
        got = pool.query(dict(popts))
        assert got is not None and got == plain.query(dict(popts))
        for action, data in script:
            eng._last_tier_delta = None
            a = eng.mutate(action, [dict(d) for d in data])
            b = plain.mutate(action, [dict(d) for d in data])
            assert a == b and "error" not in a
            pool.apply_mutation(eng._last_tier_delta)
            got = pool.query(dict(popts))
            assert got is not None, "paths must serve in-fork post-mutation"
            assert got == plain.query(dict(popts))
        assert pool.stats()["worker_errors"] == 0
    finally:
        pool.close()


def test_pool_mutation_survives_wedged_child(spark, warm_engine):
    """A SIGSTOPped (wedged, non-crashed) child must not hang the
    mutation broadcast: the ack wait polls with mutation_timeout_s and
    drops the non-acking worker, the mutation completes, and the
    remaining worker serves the post-mutation state."""
    import os
    import signal
    import time as _time

    from bikidata_spark.serving_pool import TierProcPool

    eng = warm_engine
    pool = TierProcPool(eng, 2, mutation_timeout_s=1.5)
    stopped = pool._workers[0].proc
    try:
        os.kill(stopped.pid, signal.SIGSTOP)
        eng._last_tier_delta = None
        assert "error" not in eng.mutate(
            "insert", [{"s": "<wg/1>", "p": "<p/wg>", "o": '"wedged lit"'}]
        )
        t0 = _time.monotonic()
        pool.apply_mutation(eng._last_tier_delta)
        assert _time.monotonic() - t0 < 10.0  # bounded, not hung
        assert pool.n_procs == 1  # the wedged worker was dropped
        got = pool.query(
            {"filters": [{"p": "<p/wg>"}], "size": 5, "use_cache": False}
        )
        assert got is not None and got["total"] == 1
        assert pool.stats()["worker_errors"] == 0
    finally:
        try:
            os.kill(stopped.pid, signal.SIGCONT)
        except ProcessLookupError:
            pass
        pool.close()


def test_pool_overlay_fold_in_children(spark, warm_engine, monkeypatch):
    """Children replay the same patched() calls, so a forced overlay
    fold happens at the same mutation in parent and children — results
    stay identical through it. (OVERLAY_FOLD is a class attribute set
    BEFORE the fork, so children inherit the test value.)"""
    from bikidata_spark.plans.local_tier import LocalTier

    eng = warm_engine
    monkeypatch.setattr(LocalTier, "OVERLAY_FOLD", 2)
    pool = _mk_pool(eng)
    try:
        for i in range(6):
            eng._last_tier_delta = None
            assert "error" not in eng.mutate(
                "insert", [{"s": f"<of/{i}>", "p": "<p/of>", "o": f"<t/{i % 2}>"}]
            )
            pool.apply_mutation(eng._last_tier_delta)
        o = {"filters": [{"p": "<p/of>"}], "size": 20, "use_cache": False}
        got = pool.query(dict(o))
        assert got is not None and got == eng.query(dict(o))
        assert got["total"] == 6
    finally:
        pool.close()


def test_serving_facade_with_proc_pool(spark, warm_engine):
    """End-to-end through Serving(proc_workers=2): queries, a mutation
    cycle, status surface; queries served by the pool must schedule
    ZERO Spark jobs in the parent."""
    import asyncio

    from bikidata_spark.serving import Serving

    eng = warm_engine
    srv = Serving(eng, num_workers=4, proc_workers=2)
    assert srv._proc_pool_state == "active"
    sc = spark.sparkContext
    try:
        o = {"filters": [{"p": "<p/type>", "o": "<t/1>"}], "size": 5, "use_cache": False}
        want = eng.query(dict(o))

        async def drive():
            sc.setJobGroup("pool-serve-zero-jobs", "probe")
            try:
                r1 = await srv.query_async(dict(o))
                jobs = sc.statusTracker().getJobIdsForGroup("pool-serve-zero-jobs")
            finally:
                sc.setJobGroup(None, None)
            r2 = await srv.insert_async("<sv/1>", "<p/sv>", '"served lit"')
            r3 = await srv.query_async(
                {"filters": [{"p": "<p/sv>", "o": '"served lit"'}], "size": 5, "use_cache": False}
            )
            r4 = await srv.delete_async("<sv/1>", "<p/sv>", None)
            return r1, jobs, r2, r3, r4

        r1, jobs, r2, r3, r4 = asyncio.run(drive())
        assert {k: r1[k] for k in want} == want
        assert list(jobs) == []
        assert r2["triples_inserted"] == 1
        assert r3["total"] == 1
        assert r4["triples_deleted"] == 1
        st = srv.status()
        assert st["proc_pool"]["state"] == "active"
        assert st["proc_pool"]["procs"] == 2
        assert st["proc_pool"]["worker_errors"] == 0
    finally:
        srv.close()


def test_serving_pool_retires_on_tier_demotion(spark):
    """A mutation that demotes the tier over-cap must retire the pool
    (a stale fork must never serve again); serving continues on the
    in-process path."""
    import asyncio

    from bikidata_spark import Engine, from_string_quads
    from bikidata_spark.serving import Serving

    quads = spark.createDataFrame(
        [(f"<c/{i}>", "<p>", f'"v{i}"', "") for i in range(10)],
        "s string, p string, o string, g string",
    )
    eng = Engine(from_string_quads(quads).cache(), local_tier_rows=11)
    assert eng._local_tier() is not None
    srv = Serving(eng, num_workers=2, proc_workers=2)
    assert srv._proc_pool_state == "active"
    try:
        async def drive():
            r1 = await srv.insert_async("<c/a>", "<p>", '"va"')  # 11: at cap
            r2 = await srv.insert_async("<c/b>", "<p>", '"vb"')  # 12: demotes
            r3 = await srv.query_async(
                {"filters": [{"p": "<p>", "o": '"vb"'}], "use_cache": False}
            )
            return r1, r2, r3

        r1, r2, r3 = asyncio.run(drive())
        assert r1["triples_inserted"] == 1 and r2["triples_inserted"] == 1
        assert r3["total"] == 1
        assert srv._proc_pool is None
        assert srv.status()["proc_pool"]["state"] == "retired"
    finally:
        srv.close()


def test_pool_requires_resident_tier(spark):
    from bikidata_spark.serving import Serving
    from bikidata_spark.serving_pool import TierProcPool

    eng = _mk_engine(spark, tier=False)
    with pytest.raises(ValueError):
        TierProcPool(eng, 1)
    srv = Serving(eng, num_workers=2, proc_workers=2)
    try:
        assert srv._proc_pool is None and srv._proc_pool_state == "no_tier"
    finally:
        srv.close()


def test_pool_concurrent_queries_and_mutations_stress(spark, warm_engine):
    """Hammer Serving(proc_workers=2) with concurrent queries while
    mutations interleave. Every response must be internally valid (no
    errors, no worker deaths), queries dispatched after a mutation's
    ack must see its effect (per-worker pipe FIFO + checkout
    exclusivity), and the final state must match a control engine."""
    import asyncio

    from bikidata_spark.serving import Serving

    eng = warm_engine
    plain = _mk_engine(spark, tier=False)
    srv = Serving(eng, num_workers=8, proc_workers=2)
    assert srv._proc_pool_state == "active"
    q_static = {"filters": [{"p": "<p/type>", "o": "<t/1>"}], "size": 3, "use_cache": False}
    errors: list = []

    async def reader(stop):
        while not stop.is_set():
            try:
                r = await srv.query_async(dict(q_static))
                if "results" not in r:
                    errors.append(r)
            except Exception as e:  # noqa: BLE001
                errors.append(e)
            await asyncio.sleep(0)

    async def writer():
        for i in range(12):
            r = await srv.insert_async(f"<st/{i}>", "<p/stress>", f'"stress lit {i}"')
            assert r.get("triples_inserted") == 1, r
            # a query submitted AFTER the mutation ack must see it
            seen = await srv.query_async(
                {"filters": [{"p": "<p/stress>", "o": f'"stress lit {i}"'}],
                 "size": 2, "use_cache": False}
            )
            assert seen["total"] == 1, (i, seen)
            if i % 3 == 2:
                r = await srv.delete_async(f"<st/{i}>", "<p/stress>", None)
                assert r.get("triples_deleted") == 1, r

    async def main():
        stop = asyncio.Event()
        readers = [asyncio.create_task(reader(stop)) for _ in range(6)]
        await writer()
        stop.set()
        await asyncio.gather(*readers)

    try:
        asyncio.run(main())
        assert not errors, errors[:3]
        st = srv.status()
        assert st["proc_pool"]["state"] == "active"
        assert st["proc_pool"]["procs"] == 2
        assert st["proc_pool"]["worker_errors"] == 0
        # final-state differential vs a control engine
        for i in range(12):
            plain.mutate("insert", [{"s": f"<st/{i}>", "p": "<p/stress>", "o": f'"stress lit {i}"'}])
            if i % 3 == 2:
                plain.mutate("delete", [{"s": f"<st/{i}>", "p": "<p/stress>"}])
        o = {"filters": [{"p": "<p/stress>"}], "size": 50, "use_cache": False}
        got = srv._proc_pool.query(dict(o))
        assert got is not None and got == plain.query(dict(o))
    finally:
        srv.close()


def test_serving_refork_after_retirement(spark):
    """After the pool retires (tier demotion), refork() rebuilds it
    once the tier is resident again and serving resumes on forks."""
    import asyncio

    from bikidata_spark import Engine, from_string_quads
    from bikidata_spark.serving import Serving

    quads = spark.createDataFrame(
        [(f"<c/{i}>", "<p>", f'"v{i}"', "") for i in range(10)],
        "s string, p string, o string, g string",
    )
    eng = Engine(from_string_quads(quads).cache(), local_tier_rows=11)
    assert eng._local_tier() is not None
    srv = Serving(eng, num_workers=2, proc_workers=2)
    try:
        async def drive():
            await srv.insert_async("<c/a>", "<p>", '"va"')
            return await srv.insert_async("<c/b>", "<p>", '"vb"')  # 12 > cap: retires

        asyncio.run(drive())
        assert srv._proc_pool_state == "retired"
        # raise the cap and refork during this quiescent window
        eng.local_tier_rows = 1000
        assert srv.refork(2) is True
        assert srv._proc_pool_state == "active"
        got = srv._proc_pool.query(
            {"filters": [{"p": "<p>", "o": '"vb"'}], "use_cache": False}
        )
        assert got is not None and got["total"] == 1
    finally:
        srv.close()


@pytest.mark.skipif(
    not __import__("os").path.exists("/proc/self/smaps_rollup"),
    reason="needs Linux smaps_rollup for USS",
)
def test_pool_cow_blob_sharing_and_overlay_replay_at_scale(spark, monkeypatch):
    """VERDICT r10 item 4 (scaled twin of the sf1 sweep): a fork over a
    blob-backed TermDict in the ~100 MB range must (a) SHARE the blob
    copy-on-write — after serving hydrating queries that decode values
    across the whole blob, each child's USS stays well under the blob
    size (a child that copied the blob shows USS ≳ noise + blob) — and
    (b) stay byte-identical through mutation broadcasts that force a
    TermDict overlay fold inside the fork. True-sf1 CoW numbers are in
    docs/BENCH_NOTES.md (tools/serving_sweep.py, fork_mem column).
    """
    import os

    from bikidata_spark import Engine, from_string_quads
    from bikidata_spark.plans.local_tier import LocalTier

    n = 100_000
    quads = spark.range(n).selectExpr(
        "concat('<m/', id, '>') as s",
        "'<p/desc>' as p",
        # ~1.1 KB unique literal per subject -> ~110 MB blob
        "concat('\"', repeat(concat('w', id, ' '), 150), '\"') as o",
        "cast(null as string) as g",
    ).union(
        spark.range(n).selectExpr(
            "concat('<m/', id, '>') as s",
            "'<p/type>' as p",
            "concat('<t/', id % 5, '>') as o",
            "cast(null as string) as g",
        )
    )
    graph = from_string_quads(quads).cache()
    graph.triples.count()
    eng = Engine(graph)
    # warm the tier before forking
    assert eng.query({"filters": [{"p": "<p/type>", "o": "<t/1>"}], "size": 1})
    tier = eng._local_tier()
    assert tier is not None
    blob_bytes = len(tier.terms.blob)
    assert blob_bytes > 80 * 1024 * 1024, f"blob only {blob_bytes} B — scale the test up"

    monkeypatch.setattr(LocalTier, "OVERLAY_FOLD", 4)  # inherited by forks
    pool = _mk_pool(eng, n=2)
    plain = Engine(graph, local_tier_rows=0)
    try:
        # (a) decode values across the blob from inside the forks:
        # hydrated pages at spread-out starts touch ~2000 literals each
        for start in range(0, 20_000, 2_000):
            o = {
                "filters": [{"p": "<p/type>"}],
                "size": 200,
                "start": start,
                "use_cache": False,
            }
            got = pool.query(dict(o))
            want = plain.query(dict(o))
            assert got is not None and got == want, f"diverged at start={start}"
        mem = pool.worker_memory()
        assert len(mem) == 2
        for m in mem:
            uss = m["uss_kb"] * 1024
            # full-copy failure mode: USS ~ interpreter noise + blob
            # (>140 MB here); CoW keeps it at noise (<~60 MB measured)
            assert uss < 0.4 * blob_bytes + 48 * 1024 * 1024, (
                f"fork {m['pid']} USS {uss / 1e6:.0f} MB vs blob "
                f"{blob_bytes / 1e6:.0f} MB — copy-on-read blowup"
            )

        # (b) literal-inserting mutations past OVERLAY_FOLD: the fold
        # runs inside each fork; answers must match the distributed
        # control engine byte-for-byte
        for i in range(10):
            eng._last_tier_delta = None
            a = eng.mutate(
                "insert",
                [{"s": f"<mf/{i}>", "p": "<p/desc>", "o": f'"folded literal {i}"'}],
            )
            b = plain.mutate(
                "insert",
                [{"s": f"<mf/{i}>", "p": "<p/desc>", "o": f'"folded literal {i}"'}],
            )
            assert a == b and "error" not in a
            assert eng._last_tier_delta is not None
            pool.apply_mutation(eng._last_tier_delta)
        for o in (
            {"filters": [{"p": "<p/desc>"}], "size": 20, "use_cache": False},
            {
                "filters": [{"p": "<p/type>", "o": "<t/2>"}],
                "size": 25,
                "start": 500,
                "use_cache": False,
            },
            {"size": 0, "aggregates": ["properties", "<p/type>"]},
        ):
            got = pool.query(dict(o))
            want = plain.query(dict(o))
            assert got is not None and got == want, f"post-fold diverged on {o}"
        assert pool.stats()["worker_errors"] == 0
    finally:
        pool.close()
        graph.unpersist()


def test_pool_fts_mirror_fold_in_children(spark, warm_engine, monkeypatch):
    """r11 array-backed _LocalFts: literal-inserting mutations push the
    mirror's overlay past OVERLAY_FOLD so the fold runs inside parent
    AND forks (class attr set before the fork); fts answers must stay
    identical to a distributed control engine through it."""
    from bikidata_spark.plans.local_tier import _LocalFts

    eng = warm_engine
    plain = _mk_engine(spark, tier=False)
    monkeypatch.setattr(_LocalFts, "OVERLAY_FOLD", 2)
    pool = _mk_pool(eng)
    try:
        for i in range(6):
            eng._last_tier_delta = None
            a = eng.mutate(
                "insert",
                [{"s": f"<ff/{i}>", "p": "<p/desc>", "o": f'"zulu fold {i}"'}],
            )
            b = plain.mutate(
                "insert",
                [{"s": f"<ff/{i}>", "p": "<p/desc>", "o": f'"zulu fold {i}"'}],
            )
            assert a == b and "error" not in a
            assert eng._last_tier_delta is not None
            pool.apply_mutation(eng._last_tier_delta)
        for q in ("zulu", "fold", "zulu fold", "alpha"):
            o = {"filters": [{"p": "fts", "o": q}], "size": 25, "use_cache": False}
            got = pool.query(dict(o))
            want = plain.query(dict(o))
            assert got is not None and got == want, f"fts diverged on {q!r}"
        st = eng._local_tier()._fts_state
        assert st is not None and st[1] is not None and not st[1].extra  # folded
        assert pool.stats()["worker_errors"] == 0
    finally:
        pool.close()
