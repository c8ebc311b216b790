"""Mutation-cycle latency probe for the zero-job tier path.

Builds an Engine at $SPARK_GRAFT_SF_DIR (default testdata_sf1, tier cap
via BIKIDATA_SPARK_LOCAL_TIER_ROWS) and times N insert-IRI / insert-
literal / point-query / delete cycles through Engine.mutate — the
workload behind BENCH_NOTES' "sf1 scale row". r8's O(cap) index-merge
patch put the sf1 cycle at 1.4-1.7 s p50; the r9 overlay patch
(plans/local_tier.LocalTier.patched) targets O(delta) — p50 <= 0.3 s.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bikidata_spark import Engine, from_string_quads
from bikidata_spark.session import get_spark
from bikidata_spark.sources.rdfize import string_quads


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "testdata_sf1")
    cycles = int(os.environ.get("PROBE_CYCLES", "8"))
    spark = get_spark("mutation-probe")
    sc = spark.sparkContext
    graph = from_string_quads(string_quads(spark, sf_dir)).cache()
    graph.triples.count()
    graph.terms.count()
    eng = Engine(graph)
    t0 = time.perf_counter()
    assert eng._local_tier() is not None, (
        "tier over cap — raise BIKIDATA_SPARK_LOCAL_TIER_BYTES (and/or "
        "BIKIDATA_SPARK_LOCAL_TIER_ROWS)"
    )
    build_s = time.perf_counter() - t0
    eng.query({"filters": [{"p": "<p/type>", "o": "<c/customer>"}], "size": 1})

    steps: dict[str, list[float]] = {
        "insert_iri": [], "insert_lit": [], "query": [], "delete": [],
    }
    sc.setJobGroup("mutation-probe", "cycles")
    try:
        for i in range(cycles):
            t = time.perf_counter()
            r = eng.mutate("insert", [{"s": f"<mp/{i}>", "p": "<p/peer>", "o": "<e/nation/1>"}])
            steps["insert_iri"].append(time.perf_counter() - t)
            assert r.get("triples_inserted") == 1, r
            t = time.perf_counter()
            r = eng.mutate("insert", [{"s": f"<mp/{i}>", "p": "<p/desc>", "o": f'"probe literal {i} zxqv"'}])
            steps["insert_lit"].append(time.perf_counter() - t)
            assert r.get("triples_inserted") == 1, r
            t = time.perf_counter()
            q = eng.query({"filters": [{"p": "<p/desc>", "o": f'"probe literal {i} zxqv"'}], "size": 5, "use_cache": False})
            steps["query"].append(time.perf_counter() - t)
            assert q["total"] == 1, q
            t = time.perf_counter()
            r = eng.mutate("delete", [{"s": f"<mp/{i}>", "p": "<p/peer>"}])
            dt = time.perf_counter() - t
            r2 = eng.mutate("delete", [{"s": f"<mp/{i}>", "p": "<p/desc>"}])
            steps["delete"].append((dt + (time.perf_counter() - t - dt)) / 2)
            assert r.get("triples_deleted") == 1 and r2.get("triples_deleted") == 1, (r, r2)
        jobs = len(sc.statusTracker().getJobIdsForGroup("mutation-probe"))
    finally:
        sc.setJobGroup(None, None)

    st = eng.cache_stats()["local_tier"]
    out = {
        "sf_dir": sf_dir,
        "cycles": cycles,
        "tier_build_s": round(build_s, 3),
        "quads": st.get("quads"),
        "overlay_pending": st.get("overlay_pending"),
        "spark_jobs_all_cycles": jobs,
        "p50_s": {k: round(statistics.median(v), 4) for k, v in steps.items()},
        "max_s": {k: round(max(v), 4) for k, v in steps.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
