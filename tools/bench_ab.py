"""A/B a subset of bench.py sections between two checkouts (r10 verdict
item: attribute q_boolean_filter +34% / q_property_hop +21% /
q_build_index +14% to host state vs the r10 commits).

Runs THE SAME three sections as bench.py (same opts, same warmup
protocol, median of reps) against whichever repo root is given, in a
fresh process, and prints one JSON line. Drive it alternately against
HEAD and a worktree of the old commit on a quiet host:

    git worktree add /tmp/ab_r9 <r9-commit>
    for i in 1 2 3; do
      python tools/bench_ab.py /tmp/ab_r9  >> /tmp/ab.jsonl
      python tools/bench_ab.py /root/repo  >> /tmp/ab.jsonl
    done

Interleaving controls for host drift; each invocation is a fresh JVM.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def main() -> None:
    root = os.path.abspath(sys.argv[1] if len(sys.argv) > 1 else ".")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    sys.path.insert(0, root)

    from bikidata_spark import Engine, from_string_quads
    from bikidata_spark.session import get_spark
    from bikidata_spark.sources.rdfize import string_quads

    spark = get_spark("bikidata-bench-ab")
    # bench.py's warmup protocol: touch footers, run one tiny end-to-end
    for t in "region nation customer supplier part orders lineitem".split():
        try:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").schema
        except Exception:
            pass
    warm_dir = "/root/testdata/sf0.001"
    wg = from_string_quads(string_quads(spark, warm_dir)).cache()
    wg.triples.count()
    Engine(wg).page({"filters": [{"p": "<p/type>", "o": "<c/customer>"}], "size": 5})
    wg.unpersist()

    times: dict[str, float] = {}
    rep_times: dict[str, list[float]] = {}

    def timed(name, fn):
        fn()  # untimed warmup, same as bench.py
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        rep_times[name] = [round(x, 3) for x in runs]
        times[name] = round(statistics.median(runs), 3)

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
        "q_property_hop",
        lambda: eng.subjects_values(
            {"filters": [{"p": "<p/nation> 1", "o": "<e/nation/5>"}], "use_cache": False}
        ).count(),
    )
    print(json.dumps({"root": root, "sf_dir": sf_dir, "times": times, "reps": rep_times}))


if __name__ == "__main__":
    main()
