"""Dump .explain("formatted") before/after evidence for the round-14
optimizations into plans/r14/<name>_{before,after}.txt.

Runs the SAME scenarios against two code states:

    python tools/plan_dump_r14.py after            # from HEAD
    python tools/plan_dump_r14.py before           # from an r13 worktree

Feature detection (``graph.write_s_projection`` / the 256-cell matmul
gate / the memos) picks the code path that exists in the checked-out
tree, so the "before" files are the r13 plans, not a simulation.

Scenarios (one file pair per r14-touched query path):

- hydrate_point_probe — Engine._point_probe_triples under a persisted
  store: r13 builds a lazy per-process repartitionByRange projection
  (an InMemoryTableScan after a range Exchange); r14 prefers the
  store's ``triples_by_s`` sidecar (FileScan, ``s IN (page)`` pushed).
- properties — Engine.properties(): r13 runs the corpus groupBy per
  call; r14 memoizes per generation (second call = LocalTableScan,
  zero jobs). Both calls' plans + measured job counts are recorded.
- filter_total — Engine.query() page total for a repeated filter spec:
  plan of the page is unchanged; the memo drops the distinct-member
  count JOB on repeats, so the evidence is the per-call job count.
- ivf_assign — operators.similarity._assign_cells at >=256 cells:
  r13 folds a broadcast centroid array per row (interpreted HOF);
  r14 ships the centroid matrix once and runs an Arrow-batched numpy
  matmul (ArrowEvalPython node).
- count_by_property — Engine.count_by_property(prop): before, every
  call re-runs the corpus count_distinct aggregation; after, repeats
  of an under-cap property serve memoized driver rows (LocalRelation,
  zero jobs). Set PLAN_DUMP_ONLY=count_by_property to dump just this
  pair (the others' before state is the r13 tree, this one's is the
  mid-r14 tree).
- fanout — session.ensure_parallelism width: before, every fan-out
  consumer repartitions a tiny input to defaultParallelism
  unconditionally (RoundRobinPartitioning(32) on a 0.6 MB table);
  after, the width derives from the optimizer's size estimate (one
  partition per BIKIDATA_SPARK_FANOUT_BYTES, capped at cores). Run
  with SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 and
  PLAN_DUMP_ONLY=fanout (the before state is the pre-change r14 tree
  at 5f93ae8).
- ivf_store_probe — operators.similarity.ivf_store_topk: before, every
  call runs a distinct-collect job chain over the distributed probes
  frame (queries × one-row centroid array, HOF fold, distinct
  Exchange) just to learn its pruned cells, and the scored join's
  broadcast side re-runs the same subtree; after, one bounded collect
  localizes the (qid, qv, cell) probe rows — cells fall out
  driver-side and the broadcast side is the collected rows. The
  "before" file is produced by forcing the fallback arm
  (BIKIDATA_SPARK_PROBE_LOCAL_ROWS=0), which IS the pre-change plan
  verbatim (the code keeps it as the over-cap path).
- semantic_probe — Engine._semantic_filter with a loaded IVF store:
  before, every query runs a Spark job (one-row crossJoin over the
  broadcast centroid array) just to resolve its nprobe cells; after,
  load_ivf collects the tiny centroid table once and resolution is a
  driver-side fold (local_tier.probe_cells_fold) — the whole probe
  job disappears from every request. Set
  PLAN_DUMP_ONLY=semantic_probe to dump just this pair (its before
  state is the late-r14 tree at 2daf20e).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
from pathlib import Path

# PLAN_DUMP_REPO points the import at a different code state (e.g. a
# worktree of the r13 end-of-round commit for the _before files)
REPO = Path(os.environ.get("PLAN_DUMP_REPO", Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(REPO))

MODE = sys.argv[1] if len(sys.argv) > 1 else "after"
OUT = Path(sys.argv[2]) if len(sys.argv) > 2 else REPO / "plans" / "r14"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

OUT.mkdir(parents=True, exist_ok=True)

# the lazy point-probe projection only engages for over-tier-cap
# engines; force it so the sf0.01 scenario exercises the distributed
# path both rounds ship for 100 TB stores
os.environ["BIKIDATA_SPARK_POINT_PROBE_FRAME"] = "1"

from pyspark.sql import functions as F  # noqa: E402

from bikidata_spark import Engine, from_string_quads  # noqa: E402
from bikidata_spark.graph import read_graph, write_graph  # noqa: E402
from bikidata_spark.operators import similarity as sim  # noqa: E402
from bikidata_spark.session import get_spark  # noqa: E402
from bikidata_spark.sources.rdfize import string_quads  # noqa: E402

try:
    from bikidata_spark.graph import write_s_projection  # r14
except ImportError:  # r13 tree
    write_s_projection = None


def fmt_plan(df) -> str:
    jqe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jqe.explainString(mode)


def write(name: str, text: str) -> None:
    p = OUT / f"{name}_{MODE}.txt"
    p.write_text(text)
    print(f"wrote {p} ({len(text)} bytes)")


def _want(name: str) -> bool:
    only = os.environ.get("PLAN_DUMP_ONLY")
    return not only or only == name


def jobs_for(spark, tag: str, fn):
    sc = spark.sparkContext
    sc.setJobGroup(tag, tag)
    r = fn()
    n = len(sc.statusTracker().getJobIdsForGroup(tag))
    sc.setJobGroup(None, None)
    return r, n


def main() -> None:
    spark = get_spark("plan-dump-r14")
    graph = None
    if any(
        _want(n)
        for n in (
            "hydrate_point_probe",
            "properties",
            "filter_total",
            "count_by_property",
            "semantic_probe",
        )
    ):
        graph = from_string_quads(string_quads(spark, SF_DIR)).cache()
        graph.triples.count()

    # --- hydrate_point_probe -------------------------------------------
    if _want("hydrate_point_probe"):
        _dump_point_probe(spark, graph)
    if _want("properties"):
        _dump_properties(spark, graph)
    if _want("filter_total"):
        _dump_filter_total(spark, graph)
    if _want("ivf_assign"):
        _dump_ivf_assign(spark)
    if _want("count_by_property"):
        _dump_count_by_property(spark, graph)
    if _want("semantic_probe"):
        _dump_semantic_probe(spark, graph)
    if _want("fanout"):
        _dump_fanout(spark)
    if _want("ivf_store_probe"):
        _dump_ivf_store_probe(spark)

    spark.stop()


def _dump_point_probe(spark, graph) -> None:
    store = tempfile.mkdtemp(prefix="plandump_store_")
    try:
        write_graph(graph, store)
        if write_s_projection is not None:
            write_s_projection(read_graph(spark, store), store)
        g2 = read_graph(spark, store)
        eng = Engine(g2)
        # page of subject hashes to probe (what hydration does)
        page = [r["s"] for r in g2.triples.select("s").distinct().limit(20).collect()]
        # r13 builds the lazy projection on the SECOND sighting
        eng._point_probe_triples()
        probe = eng._point_probe_triples().filter(F.col("s").isin(page))
        _, njobs = jobs_for(spark, "pp-probe", probe.count)
        write(
            "hydrate_point_probe",
            f"# Engine._point_probe_triples().filter(s IN page-of-20) over a "
            f"persisted store ({SF_DIR})\n"
            f"# code state: {MODE}; probe ran {njobs} Spark job(s)\n"
            f"# s-projection sidecar present: "
            f"{write_s_projection is not None}\n\n" + fmt_plan(probe),
        )
    finally:
        shutil.rmtree(store, ignore_errors=True)


def _dump_properties(spark, graph) -> None:
    # wrap the whole call+collect: the r14 memo does its one corpus job
    # INSIDE properties() (then serves a LocalRelation), while the r13
    # code returns a lazy corpus aggregate that runs at collect time
    eng2 = Engine(graph)
    df1, n1 = jobs_for(spark, "props-1", lambda: eng2.properties())
    _, c1 = jobs_for(spark, "props-1c", df1.collect)
    n1 += c1
    plan1 = fmt_plan(df1)
    df2, n2 = jobs_for(spark, "props-2", lambda: eng2.properties())
    _, c2 = jobs_for(spark, "props-2c", df2.collect)
    n2 += c2
    plan2 = fmt_plan(df2)
    write(
        "properties",
        f"# Engine.properties() ({SF_DIR})\n"
        f"# code state: {MODE}; first call {n1} job(s), second call {n2} job(s)\n\n"
        f"## first call\n{plan1}\n## second call (repeat, same generation)\n{plan2}",
    )


def _dump_filter_total(spark, graph) -> None:
    # plan shape of the page itself is identical before/after; the r14 memo
    # removes the distinct-member count JOB on repeats — record job counts
    # across three identical requests (rep 2 pays one-time projection
    # builds; rep 3 is steady state)
    import bikidata_spark.plans.query as qmod

    old_fast = getattr(qmod, "_FAST_PAGE_ROWS", None)
    qmod._FAST_PAGE_ROWS = 10  # force the distributed count path at sf0.01
    try:
        eng3 = Engine(graph, local_tier_bytes=1, term_cache_bytes=0)
        opts = {"filters": [{"p": "<p/nation>"}], "size": 5, "use_cache": False}
        r1, j1 = jobs_for(spark, "ft-1", lambda: eng3.query(dict(opts)))
        r2, j2 = jobs_for(spark, "ft-2", lambda: eng3.query(dict(opts)))
        r3, j3 = jobs_for(spark, "ft-3", lambda: eng3.query(dict(opts)))
        assert r1["total"] == r3["total"]
        subj = eng3.subjects_values(
            {"filters": [{"p": "<p/nation>"}], "use_cache": False}
        )
        write(
            "filter_total",
            f"# Engine.query() repeated filter spec ({SF_DIR}); total={r1['total']}\n"
            f"# code state: {MODE}; jobs per call: rep1={j1} rep2={j2} rep3={j3}\n"
            f"# (the page plan below is identical before/after — the r14 memo\n"
            f"#  removes the distinct-member count job from rep3)\n\n"
            + fmt_plan(subj),
        )
    finally:
        if old_fast is not None:
            qmod._FAST_PAGE_ROWS = old_fast


def _dump_ivf_assign(spark) -> None:
    # 70k vectors -> step 264 -> ~266 cells: over the 256-cell gate in r14,
    # same fold as every smaller scale in r13
    n = 70_000
    v = (
        spark.range(n)
        .select(
            F.col("id").alias("nid"),
            # +1 keeps every vector non-zero: the r13 fold divides by the
            # norm with no zero clamp (ANSI DIVIDE_BY_ZERO)
            F.array(*[
                (((F.col("id") * (i + 3)) % 97) + 1).cast("double") for i in range(8)
            ]).alias("nv"),
        )
    )
    step = sim._seed_step(v)
    cents = v.filter(F.col("nid") % step == 0).select(
        F.col("nid").alias("cid"), F.col("nv").alias("cv")
    )
    ncells = cents.count()
    if hasattr(sim, "_assign_cells"):  # r14
        assigned = sim._assign_cells(v, cents, n_cells=ncells)
    else:  # r13: the inline fold every IVF consumer used
        carr = sim._cent_arr(cents)
        assigned = v.crossJoin(F.broadcast(carr)).select(
            "nid", "nv", sim._nearest_cid(F.col("nv"), F.col("cents")).alias("cell")
        )
    import time

    t0 = time.perf_counter()
    assigned.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    write(
        "ivf_assign",
        f"# similarity._assign_cells over {n} x 8-d vectors, {ncells} cells "
        f"(seed step {step})\n"
        f"# code state: {MODE}; noop-sink wall {dt:.2f}s on "
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]\n\n"
        + fmt_plan(assigned),
    )


def _dump_count_by_property(spark, graph) -> None:
    # same shape as _dump_properties: the memo's one corpus probe runs
    # INSIDE the first call; repeats of an under-cap property serve a
    # LocalRelation at zero jobs. Before (mid-r14 tree): both calls are
    # the lazy corpus aggregate, each collect pays the full job chain.
    eng = Engine(graph, local_tier_rows=0)
    df1, n1 = jobs_for(spark, "cbp-1", lambda: eng.count_by_property("<p/mktsegment>"))
    _, c1 = jobs_for(spark, "cbp-1c", df1.collect)
    n1 += c1
    plan1 = fmt_plan(df1)
    df2, n2 = jobs_for(spark, "cbp-2", lambda: eng.count_by_property("<p/mktsegment>"))
    _, c2 = jobs_for(spark, "cbp-2c", df2.collect)
    n2 += c2
    plan2 = fmt_plan(df2)
    write(
        "count_by_property",
        f"# Engine.count_by_property('<p/mktsegment>') ({SF_DIR}, tier-less engine)\n"
        f"# code state: {MODE}; first call {n1} job(s), second call {n2} job(s)\n\n"
        f"## first call\n{plan1}\n## second call (repeat, same generation)\n{plan2}",
    )


def _dump_semantic_probe(spark, graph) -> None:
    # bench-shaped IVF store over the sf embeddings; the steady request
    # is _semantic_filter(...)[0].count(). Before: resolving the probe
    # cells is its own Spark job per request (one-row crossJoin over
    # the broadcast centroid array — plan below). After: load_ivf
    # collected (cids, cent_mat) once and the resolution is a
    # driver-side fold; only the pruned count job remains.
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    sem_emb = emb.select(
        F.xxhash64(
            F.concat(F.lit("<e/documents/"), F.col("vec_id").cast("string"), F.lit(">"))
        ).alias("s"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    cents = emb.filter(F.col("vec_id") % sim._seed_step(emb) == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").cast("array<double>").alias("cv")
    )
    sstore = tempfile.mkdtemp(prefix="plandump_semivf_")
    try:
        sim.write_ivf_store(sem_emb, f"{sstore}/ivf", "s", "vec", centroids=cents)
        qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
        eng = Engine(graph, embeddings=sem_emb, local_tier_rows=0)
        eng.load_ivf(f"{sstore}/ivf", nprobe=2)
        eng._semantic_filter({"vector": qvec}, "", None)[0].count()  # warm
        _, njobs = jobs_for(
            spark,
            "sem-steady",
            lambda: eng._semantic_filter({"vector": qvec}, "", None)[0].count(),
        )
        subj, _ = eng._semantic_filter({"vector": qvec}, "", None)
        driver_side = getattr(eng, "_ivf_probe", None) is not None
        # the probe-resolution frame the BEFORE code runs as a job
        from bikidata_spark.operators.similarity import _cent_arr, _nearest_cells

        vectors, store_cents, nprobe = eng._ivf
        qdf = spark.createDataFrame([(qvec,)], "qvec array<double>")
        probe_frame = qdf.crossJoin(F.broadcast(_cent_arr(store_cents))).select(
            F.explode(_nearest_cells(F.col("qvec"), F.col("cents"), nprobe)).alias("cell")
        )
        write(
            "semantic_probe",
            f"# Engine._semantic_filter steady request with a loaded IVF store "
            f"({SF_DIR})\n"
            f"# code state: {MODE}; steady request ran {njobs} Spark job(s); "
            f"probe cells resolved driver-side: {driver_side}\n\n"
            f"## probe-cell resolution frame (runs as a Spark job per request "
            f"before; never executed after)\n{fmt_plan(probe_frame)}\n"
            f"## subject frame (the remaining pruned count — identical "
            f"before/after)\n{fmt_plan(subj)}",
        )
    finally:
        shutil.rmtree(sstore, ignore_errors=True)


def _dump_fanout(spark) -> None:
    # r14 size-adaptive fan-out: ensure_parallelism derives its width
    # from the optimizer's size estimate (one partition per
    # BIKIDATA_SPARK_FANOUT_BYTES, capped at defaultParallelism)
    # instead of repartitioning every small input to the core count.
    # The visible diff is the RoundRobinPartitioning width on the
    # Exchange feeding each fan-out consumer (32 -> 3 for the 0.6 MB
    # sf0.1 documents table) and the task counts of every downstream
    # stage. Representative consumer: the minhash-LSH pair join.
    from bikidata_spark.operators import dedup as dd
    from bikidata_spark.session import ensure_parallelism

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    fanned = ensure_parallelism(docs)
    width = fanned._jdf.queryExecution().toRdd().getNumPartitions()
    pairs = dd.minhash_lsh_pairs(docs, "doc_id", "text")
    import time

    pairs.count()  # untimed warmup: the bench's steady shape, not JVM cold-start
    t0 = time.perf_counter()
    _, njobs = jobs_for(spark, "fanout-mh", pairs.count)
    dt = time.perf_counter() - t0
    write(
        "dedup_fanout",
        f"# operators.dedup.minhash_lsh_pairs(documents).count() ({SF_DIR}, "
        f"local[{spark.sparkContext.defaultParallelism}])\n"
        f"# code state: {MODE}; ensure_parallelism width = {width}; "
        f"warm count ran {njobs} Spark job(s) in {dt:.2f}s (single sample; "
        f"the interleaved A/B in BENCH_NOTES is the timing evidence)\n\n"
        + fmt_plan(pairs),
    )


def _dump_ivf_store_probe(spark) -> None:
    # MODE=before forces the fallback arm (cap 0) — the pre-change plan
    # verbatim; MODE=after uses the default localized probe.
    import time

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    store = tempfile.mkdtemp(prefix="plandump_ivfstore_") + "/ivf"
    try:
        sim.write_ivf_store(emb, store, refine_iters=2)
        vectors, cents = sim.read_ivf_store(spark, store)
        queries = emb.filter(F.col("vec_id") < 5)
        if MODE == "before":
            os.environ["BIKIDATA_SPARK_PROBE_LOCAL_ROWS"] = "0"
        try:
            sim.ivf_store_topk(vectors, cents, queries).count()  # warm
            t0 = time.perf_counter()
            topk = sim.ivf_store_topk(vectors, cents, queries)
            _, njobs = jobs_for(spark, "ivfstore-probe", topk.count)
            dt = time.perf_counter() - t0
            write(
                "ivf_store_probe",
                f"# similarity.ivf_store_topk(store, 5 queries).count() ({SF_DIR})\n"
                f"# code state: {MODE}; warm call ran {njobs} Spark job(s) in "
                f"{dt:.2f}s (single sample; the interleaved A/B in BENCH_NOTES "
                f"is the timing evidence)\n\n" + fmt_plan(topk),
            )
        finally:
            os.environ.pop("BIKIDATA_SPARK_PROBE_LOCAL_ROWS", None)
    finally:
        shutil.rmtree(os.path.dirname(store), ignore_errors=True)


if __name__ == "__main__":
    main()
