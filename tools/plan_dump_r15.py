"""Dump .explain("formatted") / executed-plan + job-count evidence for
the round-15 optimizations into plans/r15/<name>_{before,after}.txt.

Runs the SAME scenarios against two code states:

    python tools/plan_dump_r15.py after            # from HEAD
    python tools/plan_dump_r15.py before           # from an r14-end worktree

Feature detection picks the code path that exists in the checked-out
tree, so the "before" files are the real r14 plans, not a simulation.

Scenarios:

- ivf_store_probe — ivf_store_topk against a persisted store: r14 runs
  one bounded collect of the (qid, qv, cell) PROBES frame (a
  crossJoin+HOF-fold job) and, over cap, wastes it before the
  distributed fallback; r15 collects the bounded QUERY rows + the tiny
  centroid table and resolves cells with the pinned driver fold
  (plans/local_tier.probe_cells_fold) — the fold job disappears from
  the call. Evidence: per-call job count + the executed scored plan.
- filter_total_nocache — Engine.query() with use_cache=False repeats
  of one filter spec: r14 served the memoized total anyway; r15 gates
  the memo read on use_cache, so a caches-off repeat runs its own
  count job (bench-policy honesty, VERDICT item 6). Evidence: per-call
  job counts (cache-allowed repeats still drop the job).
- order_page_dist — the tier-less distributed ordered page (the AQE
  stage-job floor, VERDICT item 4). Evidence: executed plan + jobs for
  one steady page.
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

MODE = sys.argv[1] if len(sys.argv) > 1 else "after"
OUT = Path(__file__).resolve().parent.parent / "plans" / "r15"
# when run from a worktree, still write into the MAIN repo's plans/r15
if not (Path(__file__).resolve().parent.parent / "bikidata_spark").is_dir():
    raise SystemExit("run from a repo root checkout")
OUT = Path(os.environ.get("PLAN_OUT", str(OUT)))
OUT.mkdir(parents=True, exist_ok=True)
SUF = "_before.txt" if MODE == "before" else "_after.txt"

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from bikidata_spark import Engine, from_string_quads  # noqa: E402
from bikidata_spark.operators import dedup as dd  # noqa: E402
from bikidata_spark.operators import similarity as sim  # noqa: E402
from bikidata_spark.session import get_spark  # noqa: E402
from bikidata_spark.sources.rdfize import string_quads  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("plan-dump-r15")
sc = spark.sparkContext


def fmt(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def jobs_for(tag: str, fn):
    sc.setJobGroup(tag, tag)
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    n = len(sc.statusTracker().getJobIdsForGroup(tag))
    sc.setJobGroup(None, None)
    return out, n, dt


def write(name: str, text: str) -> None:
    (OUT / f"{name}{SUF}").write_text(text)
    print(f"wrote {name}{SUF} ({len(text)} bytes)")


# ---- ivf_store_probe -------------------------------------------------
import shutil  # noqa: E402
import tempfile  # noqa: E402

embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
store = tempfile.mkdtemp(prefix="plans_ivf_")
try:
    sim.write_ivf_store(embs, f"{store}/ivf", refine_iters=2)
    vectors, cents = sim.read_ivf_store(spark, f"{store}/ivf")
    q = embs.filter(F.col("vec_id") < 5)
    # warmup (footer contact, codegen)
    sim.ivf_store_topk(vectors, cents, q).count()
    txt = []
    for rep in range(3):
        topk, n, dt = jobs_for(f"ivfstore-{rep}", lambda: sim.ivf_store_topk(vectors, cents, q))
        cnt, n2, dt2 = jobs_for(f"ivfstore-cnt-{rep}", lambda: topk.count())
        txt.append(f"rep {rep}: build jobs={n} ({dt:.3f}s), count jobs={n2} ({dt2:.3f}s), rows={cnt}")
    topk = sim.ivf_store_topk(vectors, cents, q)
    topk.count()
    write(
        "ivf_store_probe",
        "\n".join(txt) + "\n\n== executed scored plan ==\n" + executed(topk),
    )
finally:
    shutil.rmtree(store, ignore_errors=True)

# (an ngram_inter scenario existed while the hash-key join variant was
# live; it was reverted after the sf10 A/B measured no win — see
# docs/baseline/ab_ngram_sf10_r15.jsonl and the operator docstring)

# ---- RDF scenarios over a tier-less engine ---------------------------
graph = from_string_quads(string_quads(spark, SF_DIR)).cache()
graph.triples.count()
graph.terms.count()
eng = Engine(graph, local_tier_rows=0)  # force distributed serving

# filter_total_nocache: 3 repeats caches-off, then 3 cache-allowed.
# The fast-page caps are forced low so the spec takes the DISTRIBUTED
# page path — the one whose total the memo/fold serves (at sf0.1 every
# bench filter is fast-path-sized and never reaches it).
import bikidata_spark.plans.query as _q  # noqa: E402

_saved = (_q._FAST_PAGE_ROWS, _q._FAST_PAGE_DICT_ROWS)
_q._FAST_PAGE_ROWS = _q._FAST_PAGE_DICT_ROWS = 10
try:
    opts_nc = {
        "filters": [{"p": "<p/mktsegment>", "o": '"BUILDING"'}],
        "size": 10,
        "use_cache": False,
    }
    lines = []
    eng.query(dict(opts_nc))  # warmup / second-sighting builds
    eng.query(dict(opts_nc))
    for rep in range(3):
        _, n, dt = jobs_for(f"ftnc-{rep}", lambda: eng.query(dict(opts_nc)))
        lines.append(f"use_cache=False rep {rep}: jobs={n} ({dt:.3f}s)")
    opts_c = dict(opts_nc, use_cache=True)
    for rep in range(3):
        _, n, dt = jobs_for(f"ftc-{rep}", lambda: eng.query(dict(opts_c)))
        lines.append(f"use_cache=True  rep {rep}: jobs={n} ({dt:.3f}s)")
    write("filter_total_nocache", "\n".join(lines) + "\n")
finally:
    _q._FAST_PAGE_ROWS, _q._FAST_PAGE_DICT_ROWS = _saved

# order_page_dist: the tier-less steady ordered page
opts_o = {
    "filters": [{"p": "<p/type>", "o": "<c/customer>"}],
    "order": [{"by": "label", "dir": "desc"}],
    "size": 25,
    "start": 100,
    "use_cache": False,
}
eng.query(dict(opts_o))  # first sighting
eng.query(dict(opts_o))  # builds indexes
lines = []
for rep in range(3):
    _, n, dt = jobs_for(f"opage-{rep}", lambda: eng.query(dict(opts_o)))
    lines.append(f"steady ordered page rep {rep}: jobs={n} ({dt:.3f}s)")
# the distributed page frame itself (what the collect executes)
page = eng.page(dict(opts_o))
page.collect()
write(
    "order_page_dist",
    "\n".join(lines) + "\n\n== executed page plan ==\n" + executed(page),
)
print("done", MODE)
