"""r14 verdict item 1 — store-side s-projection cold-start probe.

The r13 dorder probe showed the LAST multi-second one-time cost in the
warmed sf10 query path: the per-process lazy s-clustered point-probe
projection build (hydration path) landing mid-query (21 s / 7 jobs).
r14 moves it store-side: CLI ``warm`` on an over-cap store now writes
``{store}/triples_by_s`` (graph.write_s_projection) and
Engine._point_probe_triples prefers the store copy outright.

This probe measures the full story on a FRESH OS process per stage:

  stage build  — write_graph(testdata_sf10 rdfized) -> store
  stage warm   — CLI warm (seeds dorder sidecar + s-projection)
  stage probe  — fresh engine over the warmed store, N reps of the
                 hydrate+order battery (baseline order_page +
                 filter_hydrate_page opts), per-rep wall time and
                 Spark job count via a job group

Done criterion (VERDICT r13 item 1): no rep above ~3 s, no rep above
4 jobs, across a 5-rep battery that interleaves hydration and ordered
pages (so the lazy build would have landed if it still existed).

Usage:
  python tools/sproj_coldstart_probe.py                # all stages
  python tools/sproj_coldstart_probe.py --stage probe  # store exists
Env: SPROJ_STORE (default .sf10store under the repo, deleted by
--cleanup), SPARK_GRAFT_SF_DIR (default testdata_sf10).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

STORE = os.environ.get("SPROJ_STORE", str(REPO / ".sf10store"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", str(REPO / "testdata_sf10"))

ORDER_OPTS = {
    "filters": [{"p": "<p/type>", "o": "<c/customer>"}],
    "order": [{"by": "label", "dir": "desc"}],
    "size": 25,
    "start": 100,
    "use_cache": False,
}
HYDRATE_OPTS = {
    "filters": [{"p": "<p/mktsegment>", "o": '"BUILDING"'}],
    "size": 20,
    "use_cache": False,
}


def stage_build() -> dict:
    from bikidata_spark import from_string_quads, write_graph
    from bikidata_spark.session import get_spark
    from bikidata_spark.sources.rdfize import string_quads

    spark = get_spark("sproj-build")
    t0 = time.perf_counter()
    g = from_string_quads(string_quads(spark, SF_DIR))
    write_graph(g, STORE)
    out = {"write_graph_s": round(time.perf_counter() - t0, 1)}
    spark.stop()
    return out


def stage_warm() -> dict:
    from bikidata_spark.__main__ import main as cli

    t0 = time.perf_counter()
    rc = cli(["warm", STORE])
    return {"warm_rc": rc, "warm_s": round(time.perf_counter() - t0, 1),
            "s_projection": os.path.isdir(os.path.join(STORE, "triples_by_s")),
            "dorder": os.path.isfile(os.path.join(STORE, "_tier", "dorder_meta.json"))}


def stage_probe(reps: int = 5) -> dict:
    from bikidata_spark import Engine, read_graph
    from bikidata_spark.session import get_spark

    spark = get_spark("sproj-probe")
    sc = spark.sparkContext
    g = read_graph(spark, STORE)
    eng = Engine(g)
    out: dict = {"sproj_attached": g.s_projection is not None, "reps": []}
    battery = [("order", ORDER_OPTS), ("hydrate", HYDRATE_OPTS)]
    for i in range(reps):
        for name, opts in battery:
            grp = f"sproj-rep-{i}-{name}"
            sc.setJobGroup(grp, "probe")
            t0 = time.perf_counter()
            r = eng.query(dict(opts))
            dt = time.perf_counter() - t0
            jobs = len(sc.statusTracker().getJobIdsForGroup(grp))
            sc.setJobGroup(None, None)
            out["reps"].append(
                {"rep": i, "q": name, "s": round(dt, 2), "jobs": jobs,
                 "total": r["total"]}
            )
    out["residency"] = {
        k: v for k, v in eng.driver_residency().items() if k != "structures"
    }
    spark.stop()
    return out


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["build", "warm", "probe", "all"], default="all")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cleanup", action="store_true")
    args = ap.parse_args()

    if args.stage == "build":
        print(json.dumps(stage_build()))
        return
    if args.stage == "warm":
        print(json.dumps(stage_warm()))
        return
    if args.stage == "probe":
        print(json.dumps(stage_probe(args.reps)))
        return

    # all: each stage in its own OS process so the probe is a true cold
    # start (fresh JVM, no driver caches)
    out: dict = {"probe": "r14 s-projection cold-start at sf10", "store": STORE}
    for stage in ("build", "warm", "probe"):
        if stage == "build" and os.path.isdir(os.path.join(STORE, "triples")):
            out["build"] = "reused existing store"
            continue
        r = subprocess.run(
            [sys.executable, __file__, "--stage", stage, "--reps", str(args.reps)],
            capture_output=True, text=True, cwd=str(REPO),
        )
        lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
        out[stage] = json.loads(lines[-1]) if lines else {"rc": r.returncode,
                                                          "stderr": r.stderr[-500:]}
    if args.cleanup:
        import shutil

        shutil.rmtree(STORE, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
