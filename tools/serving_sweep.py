"""Serving throughput sweep: QPS/p50/p95 vs worker-pool size.

Drives the bench's mixed 4-kind workload (fts / facet / semantic /
id+paths, caches off) through the Serving facade at
$SPARK_GRAFT_SF_DIR (default sf0.1) for workers in
$SWEEP_WORKERS (default "4,8,16,32") with $SWEEP_CLIENTS concurrent
requests (default 48). FAIR scheduling unless BIKIDATA_SPARK_SCHEDULER
overrides. Prints one JSON line per point plus a summary — the data
behind Serving's default num_workers (VERDICT r5 next-round #4)."""

from __future__ import annotations

import json
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("BIKIDATA_SPARK_SCHEDULER", "FAIR")

from pyspark.sql import functions as F

from bench import _serving_workload
from bikidata_spark import Engine, from_string_quads, read_graph
from bikidata_spark.operators import similarity as sim
from bikidata_spark.session import get_spark
from bikidata_spark.sources.rdfize import string_quads


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    workers_list = [int(w) for w in os.environ.get("SWEEP_WORKERS", "4,8,16,32").split(",")]
    clients = int(os.environ.get("SWEEP_CLIENTS", "48"))
    # SWEEP_STORE: serve from a warmed on-disk store instead of an
    # in-memory build — the over-cap (pure-distributed) deployment
    # shape; dorder/s-projection sidecars then engage exactly as a
    # production cold start would (r14 verdict item 3)
    store_dir = os.environ.get("SWEEP_STORE")
    with_order = os.environ.get("SWEEP_WITH_ORDER", "0") == "1"
    spark = get_spark("serving-sweep")
    if store_dir:
        graph = read_graph(spark, store_dir).cache()
    else:
        graph = from_string_quads(string_quads(spark, sf_dir)).cache()
    graph.triples.count()
    graph.terms.count()
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sem_emb = embs.select(
        F.xxhash64(
            F.concat(F.lit("<e/documents/"), F.col("vec_id").cast("string"), F.lit(">"))
        ).alias("s"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    sem_cents = embs.filter(F.col("vec_id") % sim._seed_step(embs) == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").cast("array<double>").alias("cv")
    )
    store = tempfile.mkdtemp(prefix="sweep_ivf_")
    sim.write_ivf_store(sem_emb, f"{store}/ivf", "s", "vec", centroids=sem_cents)
    qvec = [float(x) for x in embs.filter(F.col("vec_id") == 0).first()["embedding"]]
    eng = Engine(graph, embeddings=sem_emb)
    eng.load_ivf(f"{store}/ivf", nprobe=2)
    eng.fts  # build untimed

    results = {}
    # warmup pass (plans, codegen, derived caches)
    _serving_workload(eng, qvec, n=10 if with_order else 8, workers=8,
                      with_order=with_order)
    # record which mirrors actually serve the tier path (r13: the r12
    # sf3 sweep conclusion assumed the semantic leg ran brute — make
    # the engaged kinds part of the sweep record instead of a guess)
    tier = eng._local_tier()
    sem = tier._local_semantic(eng) if tier is not None else None
    fts_st = getattr(tier, "_fts_state", None) if tier is not None else None
    print(
        json.dumps(
            {
                "tier_resident": tier is not None,
                "semantic_mirror": None if sem is None else sem.kind,
                "semantic_nprobe": None if sem is None else sem.nprobe,
                "fts_mirror": bool(fts_st is not None and fts_st[1] is not None),
            }
        ),
        flush=True,
    )
    for w in workers_list:
        stats = _serving_workload(eng, qvec, n=clients, workers=w,
                                  with_order=with_order)
        results[w] = stats
        print(json.dumps({"workers": w, **stats}), flush=True)
    best = max(results, key=lambda w: results[w]["qps"])
    # multiprocess tier front-end sweep (serving_pool.TierProcPool):
    # each point forks N read-only workers over the resident mirror —
    # the GIL-escape the thread sweep above cannot reach. 0 disables.
    proc_list = [
        int(p) for p in os.environ.get("SWEEP_PROCS", "2,4,8,16").split(",") if int(p)
    ]
    if tier is None:
        # over-cap engine: there is no tier to fork — TierProcPool
        # refuses and Serving degrades to thread-only, so each "proc"
        # point would just repeat the 32-thread distributed run (r15:
        # the repeats pushed the 8 GiB default JVM, already holding
        # the cached corpus, into heap OOM after the thread curve)
        proc_list = []
    proc_results = {}
    for p in proc_list:
        stats = _serving_workload(eng, qvec, n=clients, workers=32, proc_workers=p)
        proc_results[p] = stats
        print(json.dumps({"proc_workers": p, **stats}), flush=True)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "clients": clients,
                "scheduler": os.environ.get("BIKIDATA_SPARK_SCHEDULER"),
                "sweep": results,
                "store": store_dir,
                "with_order": with_order,
                "best_workers_by_qps": best,
                "proc_sweep": proc_results,
            }
        )
    )


if __name__ == "__main__":
    main()
