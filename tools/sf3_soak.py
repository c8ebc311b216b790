"""sf3 soak of the mutation + journal path (VERDICT r8 item 7).

Parameterized form of the tests/test_mutate_tier.py differential at
corpus scale: $SPARK_GRAFT_SF_DIR (default testdata_sf3, ~33M quads)
is loaded TWICE — one engine with the tier cap raised so the zero-job
mutation path (overlay patch, driver guards, incremental FTS) runs at
scale, one distributed control engine (local_tier_rows=0) taking the
operators.mutations lineage path. Both run the same mutation script
through a journaling Serving facade; afterwards:

1. the two engines' stores must be EQUAL (Spark exceptAll both ways —
   collecting 33M rows to the driver is exactly what a soak must not
   do);
2. a query battery must agree between them;
3. the journal replays into a log-structured store
   (streaming.mutations.replay_journal path) and the net mutation
   effect in the replayed store must match the served engine for every
   touched subject — exercising read_store tombstone routing at scale.

CI-able: one JSON line, rc 0 on success. Runtime is dominated by the
two graph builds + the control engine's distributed guard jobs.
"""

from __future__ import annotations

import asyncio
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bikidata_spark import Engine, from_string_quads
from bikidata_spark.serving import Serving
from bikidata_spark.session import get_spark
from bikidata_spark.sources.rdfize import string_quads

SCRIPT = [
    ("insert", [{"s": "<sk/1>", "p": "<p/new>", "o": '"soak literal one"'}]),
    ("insert", [{"s": "<sk/1>", "p": "<p/new>", "o": '"soak literal one"'}]),  # dup guard
    ("insert", [
        {"s": "<sk/2>", "p": "<p/new>", "o": '"soak literal two"', "g": "<g/soak>"},
        {"s": "<sk/2>", "p": "<p/peer>", "o": "<e/nation/3>"},
    ]),
    ("insert", [{"s": "<sk/3>", "p": "<p/desc>", "o": '"zebra quill soak item"'}]),
    ("delete", [{"s": "<sk/1>", "p": "<p/new>", "o": '"soak literal one"'}]),
    ("delete", [{"s": "<sk/1>", "p": "<p/new>", "o": '"soak literal one"'}]),  # missing guard
    ("delete", [{"s": "<sk/2>", "p": "<p/new>"}]),  # wildcard
    ("delete", [{"s": "<e/customer/7>", "p": "<p/mktsegment>"}]),  # pre-existing row
]

BATTERY = [
    {"filters": [{"p": "<p/new>", "o": '"soak literal two"'}], "size": 10},
    {"filters": [{"p": "fts", "o": "zebra quill"}], "size": 10},
    {"filters": [{"p": "<p/peer>", "o": "<e/nation/3>"}], "size": 10},
    {"filters": [{"p": "id", "o": "<e/customer/7>"}], "size": 5},
    {"size": 0, "aggregates": ["graphs"]},
]


def _frames_equal(a, b) -> bool:
    return a.exceptAll(b).limit(1).count() == 0 and b.exceptAll(a).limit(1).count() == 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "testdata_sf3")
    cap = int(os.environ.get("SOAK_TIER_CAP", "64000000"))
    spark = get_spark("sf3-soak")
    t_all = time.perf_counter()

    def build():
        g = from_string_quads(string_quads(spark, sf_dir)).cache()
        g.triples.count()
        g.terms.count()
        return g

    # rows-only cap: the soak deliberately forces the tier resident at
    # sf3 scale (the default byte budget would keep sf3 distributed)
    tiered = Engine(build(), local_tier_rows=cap, local_tier_bytes=0)
    plain = Engine(build(), local_tier_rows=0)
    t0 = time.perf_counter()
    assert tiered._local_tier() is not None, "raise SOAK_TIER_CAP"
    tier_build_s = time.perf_counter() - t0
    tiered.query({"filters": [{"p": "fts", "o": "zebra"}], "size": 1})  # warm fts

    jdir = tempfile.mkdtemp(prefix="soak_journal_")
    srv = Serving(tiered, num_workers=4, journal_dir=jdir)

    async def run_script():
        steps = []
        for action, data in SCRIPT:
            t = time.perf_counter()
            if action == "insert":
                if len(data) == 1:
                    d = data[0]
                    r = await srv.insert_async(d["s"], d["p"], d["o"], d.get("g", ""))
                else:
                    r = srv.engine.mutate("insert", [dict(d) for d in data])
                    if "error" not in r:
                        srv._journal("insert", data, False)
            else:
                d = data[0]
                r = await srv.delete_async(d["s"], d["p"], d.get("o"), d.get("g", ""))
            steps.append((action, data, r, time.perf_counter() - t))
        return steps

    steps = asyncio.run(run_script())
    mut_p50 = sorted(s[3] for s in steps)[len(steps) // 2]
    srv.close()

    control = []
    for action, data in SCRIPT:
        control.append(plain.mutate(action, [dict(d) for d in data]))
    mismatch = [
        (a, d, r, c)
        for (a, d, r, c_t), c in zip(
            [(a, d, r, t) for a, d, r, t in steps], control
        )
        if {k: v for k, v in r.items() if not k.startswith("msg_")} != c
    ]

    stores_equal = _frames_equal(
        tiered.graph.triples, plain.graph.triples
    ) and _frames_equal(tiered.graph.terms, plain.graph.terms)

    battery_diverged = []
    for opts in BATTERY:
        a = tiered.query({**opts, "use_cache": False})
        b = plain.query({**opts, "use_cache": False})
        if a != b:
            battery_diverged.append(opts)

    # journal → log-structured store → read_store: the replayed net
    # effect for every touched subject must match the served engine
    from bikidata_spark.functions.xxh import term_id
    from bikidata_spark.streaming.mutations import replay_journal

    store = tempfile.mkdtemp(prefix="soak_store_")
    q = replay_journal(spark, jdir, store)
    q.awaitTermination()
    from bikidata_spark.streaming.mutations import read_store

    replayed = read_store(spark, store).triples
    touched = [term_id(s) for s in ("<sk/1>", "<sk/2>", "<sk/3>", "<e/customer/7>")]
    eng_rows = sorted(
        map(tuple, tiered.graph.triples.filter(
            tiered.graph.triples.s.isin(touched)
        ).collect())
    )
    # the journal holds only the mutations, so the replayed store's
    # subject rows are the net INSERTED state; pre-existing rows (the
    # customer delete target) exist only in the engines — compare the
    # inserted-subject rows exactly and the deleted subject by absence
    rep_rows = sorted(
        map(tuple, replayed.select("s", "p", "o", "g").filter(
            replayed.s.isin(touched)
        ).collect())
    )
    ins_subjects = {term_id("<sk/2>"), term_id("<sk/3>")}
    eng_ins = [r for r in eng_rows if r[0] in ins_subjects]
    replay_ok = rep_rows == eng_ins

    # ---- vacuum / time-travel under concurrent load (r12, verdict
    # item 8). The manifest protocol was pytest-gated at toy scale
    # only; here the replayed sf-scale log store runs the full
    # lifecycle with READERS IN FLIGHT:
    #   v1..v3 committed across appended batches → a reader pinned to
    #   the old-but-kept v2 loops full content-signature checks while
    #   vacuum(keep_last=2) drops v1 → compact_store(force=True)
    #   rewrites the log while a latest-state reader keeps reading
    #   (transient file-miss reads are allowed during the swap; any
    #   SUCCESSFUL read must equal the net state — compaction changes
    #   layout, never content) → re-snapshot v4, vacuum(keep_last=1),
    #   and the pinned-to-v4 read still matches.
    import threading

    from pyspark.sql import functions as F

    from bikidata_spark.streaming.manifest import (
        commit_snapshot,
        read_snapshot,
        vacuum,
    )
    from bikidata_spark.streaming.mutations import compact_store, start_ingest

    def jwrite(jdir: str, seq: int, recs: list[dict]) -> None:
        tmp = os.path.join(jdir, f".m{seq:08d}.tmp")
        with open(tmp, "w") as f:
            for r in recs:
                f.write(json.dumps(r) + "\n")
        os.rename(tmp, os.path.join(jdir, f"m{seq:08d}.json"))

    def sig(triples) -> tuple:
        row = triples.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(s, p, o, g))").alias("x"),
        ).first()
        return (int(row["n"]), int(row["x"] or 0))

    # append through the SAME journal dir + replay checkpoint so batch
    # ids continue monotonically — a fresh checkpoint would restart at
    # batch=0 and overwrite the replayed store's early batch dirs
    # (writer-owned coherence: one checkpoint per target store)
    ck = f"{store}/_replay_checkpoint"
    v1 = commit_snapshot(store)
    jwrite(jdir, 90000000, [
        {"action": "insert", "s": "<vt/1>", "p": "<p/vt>", "o": '"vacuum one"', "g": ""},
    ])
    start_ingest(spark, jdir, store, ck, max_files_per_trigger=1).awaitTermination()
    v2 = commit_snapshot(store)
    jwrite(jdir, 90000001, [
        {"action": "insert", "s": "<vt/2>", "p": "<p/vt>", "o": '"vacuum two"', "g": ""},
        {"action": "delete", "s": "<vt/1>", "p": "<p/vt>", "o": "", "g": ""},
    ])
    start_ingest(spark, jdir, store, ck, max_files_per_trigger=1).awaitTermination()
    v3 = commit_snapshot(store)

    pin_sig = sig(read_snapshot(spark, store, v2).triples)
    net_sig = sig(read_snapshot(spark, store, v3).triples)

    stop_pinned, stop_latest = threading.Event(), threading.Event()
    reader_errors: list = []
    counts = {"pinned": 0, "latest_ok": 0, "latest_transient": 0}

    def pinned_reader() -> None:
        while not stop_pinned.is_set():
            try:
                s_ = sig(read_snapshot(spark, store, v2).triples)
            except Exception as e:  # a KEPT version must never fail
                reader_errors.append(("pinned read failed", repr(e)[:200]))
                return
            if s_ != pin_sig:
                reader_errors.append(("pinned diverged", s_, pin_sig))
                return
            counts["pinned"] += 1

    def latest_reader() -> None:
        while not stop_latest.is_set():
            try:
                s_ = sig(read_store(spark, store).triples)
            except Exception:
                counts["latest_transient"] += 1  # mid-swap file miss
                time.sleep(0.1)
                continue
            if s_ != net_sig:
                reader_errors.append(("latest read saw partial state", s_))
                return
            counts["latest_ok"] += 1

    tp = threading.Thread(target=pinned_reader, daemon=True)
    tl = threading.Thread(target=latest_reader, daemon=True)
    tp.start(), tl.start()
    while counts["pinned"] < 1 or counts["latest_ok"] < 1:
        if reader_errors:
            break
        time.sleep(0.05)
    vac1 = vacuum(store, keep_last=2)  # drops v1 while both readers loop
    dropped_v1_unreadable = False
    try:
        read_snapshot(spark, store, v1)
    except FileNotFoundError:
        dropped_v1_unreadable = True
    pinned_after_vacuum = counts["pinned"]
    while counts["pinned"] < pinned_after_vacuum + 2 and not reader_errors:
        time.sleep(0.05)
    stop_pinned.set()
    tp.join(timeout=120)
    compact_store(spark, store, force=True)  # latest reader stays in flight
    v4 = commit_snapshot(store)
    vac2 = vacuum(store, keep_last=1)
    stop_latest.set()
    tl.join(timeout=120)
    post_sig = sig(read_snapshot(spark, store, v4).triples)
    vacuum_ok = (
        not reader_errors
        and dropped_v1_unreadable
        and post_sig == net_sig
        and counts["pinned"] >= 3
        and counts["latest_ok"] >= 1
    )

    out = {
        "sf_dir": sf_dir,
        "quads": plain.graph.triples.count(),
        "tier_build_s": round(tier_build_s, 1),
        "mutation_p50_s": round(mut_p50, 3),
        "result_mismatches": len(mismatch),
        "stores_equal": stores_equal,
        "battery_diverged": len(battery_diverged),
        "journal_replay_ok": replay_ok,
        "vacuum_timetravel_ok": vacuum_ok,
        "vacuum_reader_counts": counts,
        "vacuum_dropped": [vac1["dropped_versions"], vac2["dropped_versions"]],
        "vacuum_reader_errors": reader_errors[:3],
        "wall_s": round(time.perf_counter() - t_all, 1),
    }
    print(json.dumps(out))
    ok = (
        stores_equal
        and not mismatch
        and not battery_diverged
        and replay_ok
        and vacuum_ok
    )
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
