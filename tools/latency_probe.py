"""Per-query job-count + latency probe for the serving surface.

Runs the BASELINE_MEASURED point-query workloads through Engine.query()
at $SPARK_GRAFT_SF_DIR (default sf0.1) and prints, per workload: median
wall seconds over N reps and the number of Spark jobs one request
schedules. Each count/collect/localCheckpoint is one driver round-trip
— the latency floor is job_count × scheduler overhead, so this is THE
number to drive down (VERDICT r5 next-round #1).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from bikidata_spark import Engine, from_string_quads
from bikidata_spark.session import get_spark
from bikidata_spark.sources.rdfize import string_quads


def workloads(qvec=None):
    w = {
        "boolean_filter": {
            "filters": [
                {"p": "<p/mktsegment>", "o": '"BUILDING"'},
                {"op": "must", "p": "<p/nation>", "o": "<e/nation/5>"},
                {"op": "not", "p": "<p/acctbal>", "o": '"0.00"'},
            ],
            "size": 10,
        },
        "hydrate": {"filters": [{"p": "<p/mktsegment>", "o": '"BUILDING"'}], "size": 10},
        "property_hop": {
            "filters": [{"p": "<p/nation> 1", "o": "<e/nation/5>"}],
            "size": 10,
        },
        "facet": {
            "filters": [{"p": "<p/mktsegment>", "o": '"BUILDING"'}],
            "aggregates": ["<p/nation>"],
            "size": 0,
        },
        "order_page": {
            "filters": [{"p": "<p/type>", "o": "<c/customer>"}],
            "order": [{"by": "label", "dir": "desc"}],
            "size": 25,
            "start": 100,
        },
        "fts": {"filters": [{"p": "fts", "o": "customer 000000013"}], "size": 10},
        "id_paths": {
            "filters": [{"p": "id", "o": "<e/customer/7>"}],
            "paths": ["<p/parent>"],
            "size": 1,
        },
    }
    return w


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("PROBE_REPS", "5"))
    spark = get_spark("latency-probe")
    sc = spark.sparkContext
    graph = from_string_quads(string_quads(spark, sf_dir)).clustered().cache()
    graph.triples.count()
    graph.terms.count()
    eng = Engine(graph)
    eng.fts  # build untimed

    out = {}
    for name, opts in workloads().items():
        opts = dict(opts, use_cache=False)
        eng.query(opts)  # warmup (plan + codegen)
        samples = []
        jobs = None
        for i in range(reps):
            group = f"probe-{name}-{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            eng.query(opts)
            samples.append(time.perf_counter() - t0)
            sc.setJobGroup(None, None)
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        samples.sort()
        out[name] = {
            "p50_s": round(statistics.median(samples), 3),
            "min_s": round(samples[0], 3),
            "jobs": jobs,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "probe": out}))


if __name__ == "__main__":
    main()
