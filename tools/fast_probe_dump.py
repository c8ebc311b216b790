"""r14 follow-up — evidence for the fast-probe skip gate.

A steady-state repeat of an over-cap filter used to pay a bounded
``limit(cap+1).toPandas()`` probe per request that was GUARANTEED to be
rejected (probe rows >= distinct members > cap). The gate consults the
(generation, filters) total memo / member-set cache first and skips the
collect when rejection is provable, so repeats fall straight to the
distributed page.

Writes plans/r14/fast_probe_{before,after}.txt with per-rep Spark job
counts, wall times, the skip counter, and the probe subtree's plan.

Usage:
  python tools/fast_probe_dump.py after                 # from HEAD
  PLAN_DUMP_REPO=<worktree> python tools/fast_probe_dump.py before
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent.parent
REPO = Path(os.environ.get("PLAN_DUMP_REPO", HERE))
sys.path.insert(0, str(REPO))

MODE = sys.argv[1] if len(sys.argv) > 1 else "after"
OUT = Path(sys.argv[2]) if len(sys.argv) > 2 else HERE / "plans" / "r14"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

OUT.mkdir(parents=True, exist_ok=True)

import bikidata_spark.plans.query as qmod  # noqa: E402
from bikidata_spark import Engine, from_string_quads  # noqa: E402
from bikidata_spark.session import get_spark  # noqa: E402
from bikidata_spark.sources.rdfize import string_quads  # noqa: E402


def fmt_plan(df) -> str:
    jqe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jqe.explainString(mode)


def main() -> None:
    spark = get_spark("fast-probe-dump")
    graph = from_string_quads(string_quads(spark, SF_DIR)).cache()
    graph.triples.count()
    # force the over-cap rejection shape the sf10 hydrate path hits
    # (member set far past the fast-page accept cap)
    qmod._FAST_PAGE_ROWS = 10
    eng = Engine(graph, local_tier_bytes=1, term_cache_bytes=0)
    opts = {"filters": [{"p": "<p/nation>"}], "size": 5, "use_cache": False}
    sc = spark.sparkContext
    rows = []
    for i in range(5):
        tag = f"fp-{i}"
        sc.setJobGroup(tag, tag)
        t0 = time.perf_counter()
        r = eng.query(dict(opts))
        dt = time.perf_counter() - t0
        n = len(sc.statusTracker().getJobIdsForGroup(tag))
        sc.setJobGroup(None, None)
        rows.append((i, n, round(dt, 3), r["total"]))
    skips = getattr(eng, "_cache_stats", {}).get("fast_probe_skips", 0)
    s_results, _ = eng.subjects(dict(opts))
    probe = s_results.select("s").limit(qmod._FAST_PAGE_ROWS + 1)
    body = "\n".join(
        f"# rep{i}: jobs={n} wall={dt}s total={tot}" for i, n, dt, tot in rows
    )
    p = OUT / f"fast_probe_{MODE}.txt"
    p.write_text(
        f"# Engine.query() repeated over-cap filter ({SF_DIR}); "
        f"_FAST_PAGE_ROWS=10 so the 1600-member set always rejects\n"
        f"# code state: {MODE}; fast_probe_skips counter = {skips}\n"
        f"{body}\n"
        f"# plan of the bounded probe subtree the gate skips on repeats:\n\n"
        + fmt_plan(probe)
    )
    print(f"wrote {p}")
    spark.stop()


if __name__ == "__main__":
    main()
