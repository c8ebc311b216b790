"""Headline benchmark. The FINAL stdout line is one compact JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
 "cpus": N, "parallelism": N, "headline_r2_keys": N, "nt_parity": bool,
 "host_noise": N}
preceded by one detail JSON line (reps, per-section noise, serving
percentiles) — the driver's tail capture parses the last line, and the
r13 single combined line grew past its capture window (r15 contract fix;
timing methodology unchanged).

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. The graph build is timed as its own entry
(the reference counts index build separately from query serving).

Noise discipline (r6): single-shot timings on this host produced two
false regression scares (r3, r5 — back-to-back identical runs differed
by up to 57%). Every section now runs ONE untimed warmup execution and
then ``$SPARK_GRAFT_BENCH_REPS`` (default 3) timed reps; ``queries``
reports the per-section MEDIAN, ``reps`` the sorted raw samples, and
``host_noise`` the median per-section relative spread
((max-min)/median) — a round-over-round delta smaller than
``host_noise`` is weather, not regression. The concurrent-serving
section stays single-shot: its stats already aggregate 24 queries.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from bikidata_spark import Engine, from_string_quads
from bikidata_spark.operators import dedup as dd
from bikidata_spark.operators import events as ev
from bikidata_spark.operators import similarity as sim
from bikidata_spark.functions.text import lang_id, quality_score
from bikidata_spark.session import get_spark
from bikidata_spark.sources.rdfize import string_quads


def _serving_workload(
    engine: Engine, qvec: list[float], n: int = 24, workers: int = 8,
    proc_workers: int = 0, with_order: bool = False,
) -> dict:
    """Drive ``Serving`` with ``n`` concurrent mixed queries and return
    latency stats. Caches are off so every query does real work.
    ``with_order`` adds a 5th kind — label-ordered pages — so over-cap
    sweeps exercise the lock-guarded driver order/member-set caches
    under concurrency (r14 verdict item 3); off by default to keep the
    4-kind mix comparable with earlier rounds' sweeps."""
    import asyncio
    import statistics

    from bikidata_spark.serving import Serving

    segs = ['"BUILDING"', '"AUTOMOBILE"', '"MACHINERY"', '"HOUSEHOLD"', '"FURNITURE"']
    opts_list = []
    for i in range(n):
        kind = i % (5 if with_order else 4)
        if kind == 4:
            opts_list.append(
                {
                    "filters": [{"p": "<p/type>", "o": "<c/customer>"}],
                    "order": [{"by": "label", "dir": "desc"}],
                    "size": 25,
                    "start": i,
                    "use_cache": False,
                }
            )
        elif kind == 0:
            opts_list.append(
                {"filters": [{"p": "fts", "o": "customer"}], "size": 10, "start": i, "use_cache": False}
            )
        elif kind == 1:
            opts_list.append(
                {
                    "size": 0,
                    "filters": [{"p": "<p/mktsegment>", "o": segs[i % 5]}],
                    "aggregates": ["<p/nation>"],
                    "use_cache": False,
                }
            )
        elif kind == 2:
            opts_list.append(
                {"filters": [{"p": "semantic", "vector": qvec}], "size": 5, "use_cache": False}
            )
        else:
            opts_list.append(
                {
                    "filters": [{"p": "id", "o": f"<e/customer/{i + 1}>"}],
                    "paths": ["<p/parent>"],
                    "size": 1,
                    "use_cache": False,
                }
            )
    srv = Serving(engine, num_workers=workers, proc_workers=proc_workers)
    lat: list[float] = []

    async def one(o):
        t0 = time.perf_counter()
        await srv.query_async(o, timeout=600)
        lat.append(time.perf_counter() - t0)

    async def run_all():
        await asyncio.gather(*(one(o) for o in opts_list))

    t0 = time.perf_counter()
    asyncio.run(run_all())
    wall = time.perf_counter() - t0
    fork_mem = None
    pool = getattr(srv, "_proc_pool", None)
    if pool is not None:
        mem = pool.worker_memory()
        if mem:
            fork_mem = {
                "forks": len(mem),
                "rss_mb_max": round(max(m["rss_kb"] for m in mem) / 1024, 1),
                "uss_mb_max": round(max(m["uss_kb"] for m in mem) / 1024, 1),
                "uss_mb_p50": round(
                    sorted(m["uss_kb"] for m in mem)[len(mem) // 2] / 1024, 1
                ),
            }
    srv.close()
    lat.sort()
    stats = {
        "queries": len(lat),
        "workers": workers,
        "wall_s": round(wall, 3),
        "qps": round(len(lat) / wall, 2),
        "p50_s": round(statistics.median(lat), 3),
        "p95_s": round(lat[max(0, int(round(len(lat) * 0.95)) - 1)], 3),
        "max_s": round(lat[-1], 3),
    }
    if fork_mem is not None:
        stats["fork_mem"] = fork_mem
    return stats


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark("bikidata-bench")
    # untimed JVM/codegen warmup (standard practice: measure the engine
    # at steady state, not JIT compilation of each plan's first run) —
    # exercise the real code paths once at the smallest scale factor
    # touch every input's footer/schema once so the timed sections
    # measure compute, not first-contact file metadata I/O
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        try:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").schema
        except Exception:
            pass
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        wg = from_string_quads(string_quads(spark, warm_dir)).cache()
        wg.triples.count()
        weng = Engine(wg)
        weng.page({"filters": [{"p": "fts", "o": "customer"}], "size": 5}).collect()
        wdocs = spark.read.parquet(f"{warm_dir}/documents.parquet")
        dd.minhash_lsh_pairs(wdocs, "doc_id", "text").count()
        wg.unpersist()
    else:
        spark.range(1_000_000).selectExpr("bit_xor(xxhash64(cast(id as string)))").collect()
    times: dict[str, float] = {}
    rep_times: dict[str, list[float]] = {}
    reps_default = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))

    def timed(name, fn, reps: int | None = None):
        """One untimed warmup run, then ``reps`` timed runs; the section
        score is the MEDIAN. Sections must be rep-safe: any state a run
        creates (caches, stores) is torn down or overwritten inside
        ``fn`` so every rep measures the same cold work.

        Scope note: engine-level derived INDEXES (compiled-plan cache,
        the full-corpus order-key frame, paths edge maps — r6) are
        deliberately NOT reset between reps: they are design-level
        indexes like the FTS index q_fts_search serves from (built
        untimed), so query sections measure warm-index serving — the
        steady state a serving deployment runs in. Result caches stay
        off (use_cache=False) so reps still do the real per-query
        work."""
        r = reps_default if reps is None else reps
        samples = []
        for i in range(r + 1):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            if i > 0 or r == 0:
                samples.append(dt)
        samples.sort()
        rep_times[name] = [round(x, 3) for x in samples]
        times[name] = round(statistics.median(samples), 3)

    def _drop_fts(idx):
        for df in (idx.postings, idx.token_df, idx.doc_len):
            try:
                df.unpersist()
            except Exception:
                pass

    # index build: string quads → dictionary-encoded graph, materialized
    graph = None

    def build():
        nonlocal graph
        if graph is not None:
            graph.unpersist()
        graph = from_string_quads(string_quads(spark, sf_dir)).cache()
        graph.triples.count()
        graph.terms.count()

    timed("q_build_index", build)
    eng = Engine(graph)

    def fts_build():
        if eng._fts is not None:
            _drop_fts(eng._fts)
            eng._fts = None
        eng.fts

    timed("q_fts_index", fts_build)

    # use_cache=False on every engine query: reps must re-measure the
    # real work, not the subject-set cache hit a repeat would get
    timed(
        "q_boolean_filter",
        lambda: eng.subjects_values(
            {
                "use_cache": False,
                "filters": [
                    {"p": "<p/mktsegment>", "o": '"BUILDING"'},
                    {"op": "must", "p": "<p/nation>", "o": "<e/nation/5>"},
                    {"op": "not", "p": "<p/acctbal>", "o": '"0.00"'},
                ],
            }
        ).count(),
    )
    timed(
        "q_fts_search",
        lambda: eng.page(
            {"filters": [{"p": "fts", "o": "customer 000000013"}], "size": 50, "use_cache": False}
        ).collect(),
    )
    timed(
        "q_property_hop",
        lambda: eng.subjects_values(
            {"filters": [{"p": "<p/nation> 1", "o": "<e/nation/5>"}], "use_cache": False}
        ).count(),
    )
    timed(
        "q_order_page",
        lambda: eng.page(
            {
                "filters": [{"p": "<p/type>", "o": "<c/customer>"}],
                "order": [{"by": "label", "dir": "desc"}],
                "size": 25,
                "start": 100,
                "use_cache": False,
            }
        ).collect(),
    )
    timed(
        "q_facet",
        lambda: eng.facet(
            eng.subjects(
                {"filters": [{"p": "<p/mktsegment>", "o": '"BUILDING"'}], "use_cache": False}
            )[0],
            "<p/nation>",
        ).collect(),
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    events = entrymod.load_events(spark, sf_dir)

    timed("q_dedup_minhash", lambda: dd.minhash_lsh_pairs(docs, "doc_id", "text").count())
    timed("q_dedup_exact", lambda: dd.exact_dedup(docs, "doc_id", "text").count())
    timed(
        "q_ann_topk",
        lambda: sim.cosine_topk(embs, embs.filter(F.col("vec_id") < 5)).count(),
    )
    timed(
        "q_ann_ivf",
        lambda: sim.ivf_ann_topk(embs, embs.filter(F.col("vec_id") < 5)).count(),
    )
    timed(
        "q_text_analysis",
        lambda: lang_id(docs, "doc_id", "text")
        .join(quality_score(docs, "doc_id", "text"), "doc_id")
        .count(),
    )
    timed("q_events_sessionize", lambda: ev.sessionize(events).count())

    # N-Triples ingest (new r5): the reference's primary ingest path is
    # gzipped N-Triples dumps. Serialize the triplization once
    # (untimed harness step), then time the distributed .nt.gz parse +
    # dictionary-encoded graph build; parity with the rdfize build is
    # checked as (row count, order-insensitive xxhash64 fold) and
    # reported in the JSON line.
    import shutil
    import tempfile

    from bikidata_spark.sources.ntriples import read_nt

    ntdir = tempfile.mkdtemp(prefix="bench_nt_")
    nt_parity = False
    try:
        quads = string_quads(spark, sf_dir)
        (
            quads.select(F.concat_ws(" ", "s", "p", "o").alias("v"))
            .select(F.concat(F.col("v"), F.lit(" .")).alias("value"))
            .write.option("compression", "gzip")
            .mode("overwrite")
            .text(f"{ntdir}/dump.nt")
        )
        nt_graph = None

        def nt_ingest():
            nonlocal nt_graph
            if nt_graph is not None:
                nt_graph.unpersist()
            # persist the parse: the dictionary build makes two passes
            # (triples + terms), and re-running gzip+regex per pass is
            # the expensive part of a text source
            parsed = read_nt(spark, f"{ntdir}/dump.nt").persist()
            nt_graph = from_string_quads(parsed).cache()
            nt_graph.triples.count()
            nt_graph.terms.count()
            parsed.unpersist()

        timed("q_nt_ingest", nt_ingest)

        # single-file bz2 dump (new r6): bzip2 is Hadoop-splittable, so
        # ONE .nt.bz2 decodes in parallel — the recommended shape for
        # big dumps (a single-member .gz decodes on one thread). The
        # coalesce(1) write is untimed harness setup.
        (
            quads.select(F.concat_ws(" ", "s", "p", "o").alias("v"))
            .select(F.concat(F.col("v"), F.lit(" .")).alias("value"))
            .coalesce(1)
            .write.option("compression", "bzip2")
            .mode("overwrite")
            .text(f"{ntdir}/dump_bz2.nt")
        )
        bz2_graph = None

        def nt_ingest_bz2():
            nonlocal bz2_graph
            if bz2_graph is not None:
                bz2_graph.unpersist()
            parsed = read_nt(spark, f"{ntdir}/dump_bz2.nt").persist()
            bz2_graph = from_string_quads(parsed).cache()
            bz2_graph.triples.count()
            bz2_graph.terms.count()
            parsed.unpersist()

        timed("q_nt_ingest_bz2", nt_ingest_bz2)

        def graph_sig(g):
            row = g.triples.select(
                F.count("*").alias("n"), F.bit_xor(F.xxhash64("s", "p", "o")).alias("h")
            ).first()
            return (row["n"], row["h"])

        # rdfize comparison graph with graphs stripped (N-Triples has
        # no graph field)
        base = from_string_quads(quads.withColumn("g", F.lit("")))
        base_sig = graph_sig(base)
        nt_parity = graph_sig(nt_graph) == base_sig and graph_sig(bz2_graph) == base_sig
        nt_graph.unpersist()
        bz2_graph.unpersist()
    finally:
        shutil.rmtree(ntdir, ignore_errors=True)

    # opt-in persisted-store section (SPARK_GRAFT_BENCH_STORE=1): write
    # the (p,s)-sorted parquet store and run a pruned property lookup
    # from it — the cold-start path a cluster would take; kept out of
    # the default headline so round-over-round totals stay comparable
    if os.environ.get("SPARK_GRAFT_BENCH_STORE") == "1":
        import shutil
        import tempfile

        from bikidata_spark.graph import read_graph, write_graph

        store = tempfile.mkdtemp(prefix="bench_store_")
        try:
            timed("q_store_write", lambda: write_graph(graph, store))
            stored = Engine(read_graph(spark, store))
            timed(
                "q_store_lookup",
                lambda: stored.subjects_values(
                    {"filters": [{"p": "<p/mktsegment>", "o": '"BUILDING"'}]}
                ).count(),
            )
        finally:
            shutil.rmtree(store, ignore_errors=True)

    # persisted-IVF serving (headline since r3; keys unchanged from the
    # r2 opt-in run): write the cell-partitioned layout, serve a pruned
    # top-k from it
    import shutil
    import tempfile

    astore = tempfile.mkdtemp(prefix="bench_ivf_")
    try:
        timed(
            "q_ann_store_write",
            lambda: sim.write_ivf_store(embs, f"{astore}/ivf", refine_iters=2),
        )
        timed(
            "q_ann_store_topk",
            lambda: sim.ivf_store_topk(
                *sim.read_ivf_store(spark, f"{astore}/ivf"),
                embs.filter(F.col("vec_id") < 5),
            ).count(),
        )
    finally:
        shutil.rmtree(astore, ignore_errors=True)

    # stemmed-index build (headline since r3): the full Porter build
    # cost relative to the plain q_fts_index entry
    from bikidata_spark.operators.fts import build_fts_index

    def stemmed_build():
        _drop_fts(build_fts_index(graph.literals(), stem=True))

    timed("q_fts_index_stemmed", stemmed_build)

    # IVF-backed semantic filter (new in r3): store write + the pruned
    # `semantic` serve path — the round's headline plan fix (the brute
    # embeddings scan per query is gone when a store is loaded)
    sstore = tempfile.mkdtemp(prefix="bench_sem_ivf_")
    serving_stats: dict[str, dict] = {}
    try:
        sem_emb = embs.select(
            F.xxhash64(
                F.concat(F.lit("<e/documents/"), F.col("vec_id").cast("string"), F.lit(">"))
            ).alias("s"),
            F.col("embedding").cast("array<double>").alias("vec"),
        )
        sem_cents = embs.filter(F.col("vec_id") % sim._seed_step(embs) == 0).select(
            F.col("vec_id").alias("cid"), F.col("embedding").cast("array<double>").alias("cv")
        )
        timed(
            "q_semantic_store_write",
            lambda: sim.write_ivf_store(sem_emb, f"{sstore}/ivf", "s", "vec", centroids=sem_cents),
        )
        qvec = [float(x) for x in embs.filter(F.col("vec_id") == 0).first()["embedding"]]
        seng = Engine(graph, embeddings=sem_emb)
        seng.load_ivf(f"{sstore}/ivf", nprobe=2)
        timed(
            "q_semantic_filter_ivf",
            lambda: seng._semantic_filter({"vector": qvec}, "", None)[0].count(),
        )

        # concurrent serving (new r5): 24 mixed queries (fts / facet /
        # semantic / paths) through the Serving facade, 8 worker
        # threads. Run once on this (FIFO) session, then restart the
        # session with spark.scheduler.mode=FAIR and run the identical
        # workload — per-query latency includes queue wait, so p95
        # captures head-of-line blocking. Engine state is rebuilt
        # untimed; the persisted semantic IVF store survives the
        # restart on disk.
        seng._fts = eng._fts  # reuse the already-built FTS index
        # warm the local tier's mirrors untimed, like the FTS index
        # above: the serving sections measure steady-state serving,
        # not the once-per-generation collect
        seng.query({"filters": [{"p": "fts", "o": "customer"}], "size": 1})
        seng.query({"filters": [{"p": "semantic", "vector": qvec}], "size": 1})
        serving_stats["fifo"] = _serving_workload(seng, qvec)
        spark.stop()
        os.environ["BIKIDATA_SPARK_SCHEDULER"] = "FAIR"
        spark = get_spark("bikidata-bench-fair")
        graph2 = from_string_quads(string_quads(spark, sf_dir)).cache()
        graph2.triples.count()
        embs2 = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        sem_emb2 = embs2.select(
            F.xxhash64(
                F.concat(F.lit("<e/documents/"), F.col("vec_id").cast("string"), F.lit(">"))
            ).alias("s"),
            F.col("embedding").cast("array<double>").alias("vec"),
        )
        feng = Engine(graph2, embeddings=sem_emb2)
        feng.load_ivf(f"{sstore}/ivf", nprobe=2)
        feng.fts  # build untimed, as on the FIFO side
        feng.query({"filters": [{"p": "fts", "o": "customer"}], "size": 1})
        feng.query({"filters": [{"p": "semantic", "vector": qvec}], "size": 1})
        t0 = time.perf_counter()
        serving_stats["fair"] = _serving_workload(feng, qvec)
        times["q_serving_concurrent"] = round(time.perf_counter() - t0, 3)

        # serving mutations (r8 continuation): 8 insert → point-query →
        # delete cycles through Engine.mutate — zero Spark jobs with the
        # tier resident (guards are sorted-array probes, the mirror is
        # patched, not re-collected; plans/query.Engine.mutate)
        t0 = time.perf_counter()
        for i in range(8):
            r1 = feng.mutate(
                "insert",
                [{"s": f"<bench/m{i}>", "p": "<bench/p>", "o": f'"bench value {i}"'}],
            )
            r2 = feng.query(
                {"filters": [{"p": "<bench/p>", "o": f'"bench value {i}"'}],
                 "size": 2, "use_cache": False}
            )
            r3 = feng.mutate("delete", [{"s": f"<bench/m{i}>", "p": "<bench/p>"}])
            assert "error" not in r1 and "error" not in r3 and r2["total"] == 1
        times["q_serving_mutations"] = round(time.perf_counter() - t0, 3)

        # multiprocess serving front-end (r9, additive): the same mixed
        # workload through Serving(proc_workers=8) — forked read-only
        # tier workers, mutations broadcast as patched() deltas
        # (serving_pool.TierProcPool). Breaks the thread pool's driver
        # GIL ceiling: sweep showed 72 → 489 QPS at this point.
        t0 = time.perf_counter()
        serving_stats["procpool"] = _serving_workload(
            feng, qvec, n=48, workers=32, proc_workers=8
        )
        times["q_serving_procpool"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(sstore, ignore_errors=True)

    total = round(sum(times.values()), 3)
    # the 13 sections benchmarked since r2 — their subtotal is the
    # round-over-round comparable number; `value` also counts sections
    # added later, so it moves when coverage widens, not just when the
    # engine does
    R2_KEYS = (
        "q_build_index q_fts_index q_boolean_filter q_fts_search "
        "q_property_hop q_order_page q_facet q_dedup_minhash q_dedup_exact "
        "q_ann_topk q_ann_ivf q_text_analysis q_events_sessionize"
    ).split()
    comparable = round(sum(times[k] for k in R2_KEYS if k in times), 3)
    # per-section relative spread (max-min)/median over the timed reps;
    # the scalar host_noise is the median across sections — the noise
    # floor below which a round-over-round delta means nothing
    noise = {
        k: round((v[-1] - v[0]) / times[k], 3) if times[k] > 0 and len(v) > 1 else 0.0
        for k, v in rep_times.items()
    }
    host_noise = round(statistics.median(noise.values()), 3) if noise else 0.0
    # Output contract (r15): the FINAL stdout line is a COMPACT headline
    # JSON — the driver captures a bounded tail of stdout and parses the
    # last line, and r13's ever-growing single line overflowed that
    # capture (PERF_r14 lost the whole round-over-round comparison).
    # Reps / per-section noise / serving percentiles move to a DETAIL
    # line printed immediately before it; both are one-line JSON, so any
    # consumer of the old combined format finds every key on one of the
    # two lines. `cpus` and `parallelism` are in the compact line so the
    # driver's core-scaling check can verify the session honored
    # $SPARK_GRAFT_CPUS instead of heuristically guessing (r14's
    # suspect_cpus_ignored false positive). Timing methodology, section
    # set, reps and env semantics are unchanged.
    detail = {
        "metric": "bikidata_spark_headline_detail",
        "serving": serving_stats,
        "bench_reps": reps_default,
        "reps": rep_times,
        "section_noise": noise,
    }
    compact = {
        "metric": "bikidata_spark_headline_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        "parallelism": spark.sparkContext.defaultParallelism,
        "headline_r2_keys": comparable,
        "nt_parity": nt_parity,
        "host_noise": host_noise,
    }
    # stop the session BEFORE printing: the JVM's unified logging can
    # emit GC warnings on STDOUT (observed on this host mid-round —
    # one swallowed a tool's JSON line), and a warning printed after
    # the final line would break the driver's last-line parse
    try:
        spark.stop()
    except Exception:
        pass
    print(json.dumps(detail))
    print(json.dumps(compact), flush=True)


if __name__ == "__main__":
    main()
