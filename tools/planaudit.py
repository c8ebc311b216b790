"""Mechanical physical-plan audit over every ``queries()`` entry.

For each entry, compiles the DataFrame (no job is run for the audit
itself — some entries build stores as a side effect of construction)
and records plan-shape metrics from the Spark plan string:

- join strategy counts (broadcast hash / sort-merge / nested-loop),
- whether any parquet scan carries PushedFilters / PartitionFilters,
- Python-eval stages (ArrowEvalPython / BatchEvalPython / mapInPandas)
  — the UDF slow path must only appear where it is by design.

Codegen spans (`*(N)` markers) only appear in EXECUTED adaptive plans,
so this compile-only audit does not report them — run a query through
``tools/selfcheck.py`` and read `.explain("formatted")` for that.

Output: one JSON object per line per entry, and a summary line. Writes
``docs/PLAN_AUDIT.json`` when run from the repo root.

``--cluster`` audits the CLUSTER-SHAPED plans instead of the laptop
ones: the session runs with ``spark.sql.autoBroadcastJoinThreshold=-1``
(no size-based broadcasts — only the explicit ``F.broadcast()`` hints
that are part of the design survive) and the RDF engine serves from a
PERSISTED graph + FTS store (``SPARK_GRAFT_GRAPH_STORE``), so scans are
parquet scans whose PushedFilters/PartitionFilters must populate, not
InMemoryTableScans. Writes ``docs/PLAN_AUDIT_CLUSTER.json``.

Usage: python tools/planaudit.py [--cluster] [sf_dir] [name_filter]
"""

from __future__ import annotations

import json
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from bikidata_spark.session import get_spark


def audit_plan(plan: str) -> dict:
    return {
        "broadcast_hash_join": plan.count("BroadcastHashJoin"),
        "sort_merge_join": plan.count("SortMergeJoin"),
        "nested_loop_join": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "pushed_filters": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        "partition_filters": bool(re.search(r"PartitionFilters: \[[^\]]", plan)),
        "adaptive": plan.lstrip().startswith("AdaptiveSparkPlan"),
        "python_eval": plan.count("ArrowEvalPython")
        + plan.count("BatchEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas"),
        "inmemory_scan": plan.count("InMemoryTableScan") > 0,
    }


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--cluster"]
    cluster = "--cluster" in sys.argv[1:]
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.001"
    name_filter = argv[1] if len(argv) > 1 else ""
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    if cluster:
        import tempfile

        os.environ["SPARK_GRAFT_GRAPH_STORE"] = tempfile.mkdtemp(prefix="cluster_store_")
    spark = get_spark("planaudit")
    if cluster:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    out: dict[str, dict] = {}
    for name, fn in entrymod.queries().items():
        if name_filter and name_filter not in name:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            rec = audit_plan(plan)
        except Exception as e:  # noqa: BLE001 — audit records, not raises
            rec = {"error": f"{type(e).__name__}: {e}"}
        out[name] = rec
        print(json.dumps({"query": name, **rec}))
    summary = {
        "entries": len(out),
        "errors": sum(1 for r in out.values() if "error" in r),
        "with_cartesian": sorted(n for n, r in out.items() if r.get("cartesian")),
        "with_nested_loop": sorted(n for n, r in out.items() if r.get("nested_loop_join")),
        "with_python_eval": sorted(n for n, r in out.items() if r.get("python_eval")),
        "with_pushed_filters": sum(1 for r in out.values() if r.get("pushed_filters")),
        "with_partition_filters": sum(1 for r in out.values() if r.get("partition_filters")),
        "with_inmemory_scan": sum(1 for r in out.values() if r.get("inmemory_scan")),
        "sf_dir": sf_dir,
        "cluster_shaped": cluster,
    }
    print(json.dumps({"summary": summary}))
    if not name_filter:
        name = "PLAN_AUDIT_CLUSTER.json" if cluster else "PLAN_AUDIT.json"
        audit_path = Path(__file__).resolve().parent.parent / "docs" / name
        audit_path.write_text(json.dumps({"queries": out, "summary": summary}, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
