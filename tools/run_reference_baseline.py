"""Measured head-to-head baseline: the reference engine vs bikidata_spark.

Runs the ACTUAL reference implementation (/root/reference, DuckDB
SQL-string engine) and this repo's Spark engine on the SAME gzipped
N-Triples dump with the SAME JSON query opts, and records wall times
plus cross-engine result parity. This replaces the "no baseline
exists" convention with measured numbers, and doubles as a third
independent correctness oracle (beyond DuckDB SQL mirrors + pytest):
the reference engine itself.

Environment shims (tools/refshim/): ``xxhash`` is satisfied via
ctypes→libxxhash.so (native hashing; per-call ctypes overhead is
measured and reported so the reference's hash-heavy build loop can be
cost-corrected), ``cohere`` is an import-only stub. The reference's
FTS index pragma needs the DuckDB `fts` extension, which cannot be
downloaded in this offline container — the build catches that final
pragma and reports it excluded; symmetrically, OUR fts/semantic index
builds are not timed here either. Everything else runs unmodified.

Usage:
    python tools/run_reference_baseline.py [--sf /root/testdata/sf0.1]
        [--reps 5] [--out docs/BASELINE_MEASURED.json] [--keep]

Writes one JSON document with {build, queries, parity, notes}.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import shutil
import statistics
import sys
import time
from glob import glob
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Same logical workload for both engines: JSON opts the two `query()`
# entry points share, plus the small introspection API. No fts /
# semantic filters (reference needs the DuckDB fts extension + a live
# Cohere key; neither exists offline).
OPTS_QUERIES: dict[str, dict] = {
    "boolean_filter": {
        "filters": [
            {"p": "<p/mktsegment>", "o": '"BUILDING"'},
            {"op": "must", "p": "<p/nation>", "o": "<e/nation/5>"},
            {"op": "not", "p": "<p/acctbal>", "o": '"0.00"'},
        ],
        "size": 1,
    },
    "filter_hydrate_page": {
        "filters": [{"p": "<p/mktsegment>", "o": '"BUILDING"'}],
        "size": 20,
    },
    "property_hop": {
        "filters": [{"p": "<p/nation> 1", "o": "<e/nation/5>"}],
        "size": 1,
    },
    "order_page": {
        "filters": [{"p": "<p/type>", "o": "<c/customer>"}],
        "order": [{"by": "label", "dir": "desc"}],
        "size": 25,
        "start": 100,
    },
    "facet": {
        "filters": [{"p": "<p/mktsegment>", "o": '"BUILDING"'}],
        "aggregates": ["<p/nation>"],
        "size": 1,
    },
    "paths": {
        "filters": [{"p": "<p/mktsegment>", "o": '"BUILDING"'}],
        "paths": ["<p/parent>"],
        "size": 10,
    },
}

SP_BATCH = [f"<e/customer/{i}>" for i in range(1, 6)]


def _timed_reps(fn, reps: int) -> dict:
    fn()  # warmup rep, excluded (JIT/plan caches on both engines)
    runs = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        runs.append(time.perf_counter() - t0)
    return {
        "median_s": round(statistics.median(runs), 4),
        "min_s": round(min(runs), 4),
        "reps": reps,
    }


def _query_signature(back: dict) -> dict:
    """Engine-neutral result signature for cross-engine parity."""
    sig = {"total": back.get("total"), "n_results": len(back.get("results", {}))}
    aggs = back.get("aggregates")
    if aggs:
        sig["aggregates"] = {
            k: sorted((int(c), str(v)) for c, v in vals) for k, vals in aggs.items()
        }
    return sig


def ensure_dump(sf_dir: str, workdir: Path) -> list[str]:
    """Write the sf triplization as a gzipped N-Triples dump (one-off,
    untimed harness step shared by both engines)."""
    dump = workdir / "dump.nt"
    parts = sorted(glob(str(dump / "part-*.txt.gz")))
    if parts:
        return parts
    from pyspark.sql import functions as F

    from bikidata_spark.session import get_spark
    from bikidata_spark.sources.rdfize import string_quads

    spark = get_spark("refbaseline-dump")
    try:
        (
            string_quads(spark, sf_dir)
            .select(F.concat_ws(" ", "s", "p", "o").alias("v"))
            .select(F.concat(F.col("v"), F.lit(" .")).alias("value"))
            .coalesce(8)
            .write.option("compression", "gzip")
            .mode("overwrite")
            .text(str(dump))
        )
    finally:
        spark.stop()
    return sorted(glob(str(dump / "part-*.txt.gz")))


def _rewrite_map_sql(sql: str) -> str:
    """Port the reference's two dictionary-load statements to DuckDB
    1.0.x (this container) — its ``read_csv(..., delim='\\t|\\t')``
    needs DuckDB >= 1.3 (the reference pins >=1.3.2; multi-byte
    delimiters are unsupported here). Equivalent single-byte form: read
    whole lines (delim = \\x01, which cannot occur in N-Triples terms)
    and split on the fixed layout ``<16-hex-hash>\\t|\\t<value>``. Same
    scan, same grouping, same insert — only the field split differs."""
    import re as _re

    m = _re.search(r"read_csv\('([^']+)'", sql)
    path = m.group(1)
    table = "literals" if "into literals" in sql else "iris"
    cmp_op = "=" if table == "literals" else "!="
    return (
        f"insert into {table} "
        f"select ('0x' || h).lower()::ubigint, ANY_VALUE(v) from ("
        f"select substr(line, 1, 16) as h, substr(line, 20) as v "
        f"from read_csv('{path}', delim='{chr(1)}', header=false, "
        f"max_line_size=5100000, quote='', columns={{'line': 'VARCHAR'}})"
        f") where substr(v, 1, 1) {cmp_op} '\"' group by h order by h"
    )


class _CursorProxy:
    def __init__(self, cur):
        self._cur = cur

    def execute(self, sql, *a, **k):
        if r"\t|\t" in sql or "\t|\t" in sql:
            sql = _rewrite_map_sql(sql)
        return self._cur.execute(sql, *a, **k)

    def __getattr__(self, name):
        return getattr(self._cur, name)


class _ConnProxy:
    def __init__(self, con):
        self._con = con

    def cursor(self):
        return _CursorProxy(self._con.cursor())

    def __getattr__(self, name):
        return getattr(self._con, name)


def run_reference(parts: list[str], workdir: Path, reps: int) -> dict:
    """Build + query the reference engine. Returns timings + result
    signatures. The reference is imported with shims on sys.path; its
    code is NOT modified (the build's two map-load statements are
    rewritten in flight for this DuckDB version — see _rewrite_map_sql)."""
    sys.path.insert(0, str(REPO / "tools" / "refshim"))
    sys.path.insert(0, "/root/reference/src")
    db_path = workdir / "ref.duckdb"
    if db_path.exists():
        db_path.unlink()
    os.environ["BIKIDATA_DB"] = str(db_path)
    os.environ["BIKIDATA_TRIPLE_PATH"] = str(workdir / "ref_triples.tmp")
    os.environ["BIKIDATA_MAP_PATH"] = str(workdir / "ref_maps.tmp")
    os.environ.setdefault("COHERE_API_KEY", "")
    os.environ["DEBUG"] = "0"

    import duckdb

    import xxhash as shim  # tools/refshim/xxhash.py

    import bikidata as ref
    import bikidata.main as ref_main

    # DuckDB-1.0 compat for the build's map-load SQL only (see
    # _rewrite_map_sql): wrap connect() so the two statements using a
    # multi-byte delimiter are rewritten in flight. The wrapper's cost
    # is one substring check per execute — nanoseconds.
    class _DuckProxyModule:
        def __getattr__(self, name):
            return getattr(duckdb, name)

        @staticmethod
        def connect(*a, **k):
            return _ConnProxy(duckdb.connect(*a, **k))

    ref_main.duckdb = _DuckProxyModule()

    out: dict = {"engine": "reference-duckdb", "hash_backend": shim.backend()}

    t0 = time.perf_counter()
    fts_excluded = False
    try:
        build_info = ref.build([str(p) for p in parts])
    except Exception as e:  # the trailing create_fts_index pragma (no ext offline)
        if "fts" in str(e).lower() or "extension" in str(e).lower():
            fts_excluded = True
            build_info = {"error": f"fts pragma skipped offline: {e.__class__.__name__}"}
        else:
            raise
    out["build_s"] = round(time.perf_counter() - t0, 3)
    out["build_info"] = {k: v for k, v in (build_info or {}).items() if k != "error"}
    out["fts_index_excluded"] = fts_excluded

    import duckdb

    con = duckdb.connect(str(db_path), read_only=True)
    n_triples = con.execute("select count(*) from triples").fetchone()[0]
    con.close()
    out["triples"] = n_triples
    # ctypes-shim correction: build() hashes s,p,o,g per triple
    per_call = shim.per_call_overhead_s()
    out["hash_shim_per_call_us"] = round(per_call * 1e6, 2)
    out["hash_shim_build_overhead_s"] = round(per_call * 4 * n_triples, 2)

    from bikidata import (
        count_by_property,
        properties,
        query,
        sp,
        spo,
        total,
    )

    queries: dict = {}
    sigs: dict = {}
    for name, opts in OPTS_QUERIES.items():
        back_holder: list = []

        def call(o=opts, h=back_holder):
            h.clear()
            h.append(query(dict(o)))

        queries[name] = _timed_reps(call, reps)
        sigs[name] = _query_signature(back_holder[0])

    queries["api_total"] = _timed_reps(lambda: total(), reps)
    sigs["api_total"] = {"total": total()}
    queries["api_properties"] = _timed_reps(lambda: properties(), reps)
    sigs["api_properties"] = {"properties": dict(sorted(properties().items()))}
    queries["api_count_by_property"] = _timed_reps(
        lambda: count_by_property("<p/type>"), reps
    )
    sigs["api_count_by_property"] = {
        "counts": dict(sorted(count_by_property("<p/type>").items()))
    }
    queries["api_sp_batch"] = _timed_reps(lambda: sp(SP_BATCH, "<p/name>"), reps)
    sp_res = sp(SP_BATCH, "<p/name>")
    sigs["api_sp_batch"] = {
        "sp": {k: sorted(map(str, v)) for k, v in sp_res.items()}
    }
    queries["api_spo"] = _timed_reps(lambda: spo("<e/customer/1>", None, None), reps)
    out["queries"] = queries
    out["signatures"] = sigs
    return out


def run_ours(parts: list[str], reps: int) -> dict:
    """Build + query bikidata_spark from the same dump, same opts."""
    from bikidata_spark import Engine, from_string_quads
    from bikidata_spark.session import get_spark
    from bikidata_spark.sources.ntriples import read_nt

    spark = get_spark("refbaseline-spark")
    out: dict = {
        "engine": "bikidata-spark",
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    }
    # warmup outside build timing: touch codegen paths at tiny scale
    spark.range(1_000_000).selectExpr("bit_xor(xxhash64(cast(id as string)))").collect()

    graph_holder: list = []
    t0 = time.perf_counter()
    parsed = read_nt(spark, [str(p) for p in parts]).persist()
    # serving build recipe: cluster for point-query batch pruning
    # (Graph.clustered — counted inside build_s, like the reference's
    # own physical layout work inside ITS build)
    graph = from_string_quads(parsed).clustered().cache()
    graph.triples.count()
    graph.terms.count()
    parsed.unpersist()
    eng = Engine(graph)
    # the s-clustered point-probe projection builds lazily on the
    # second probe against a stable base (Engine._point_probe_triples);
    # trigger it HERE so its one-time shuffle lands in build_s — the
    # reference's physical-layout work (DuckDB indexes) is inside ITS
    # build too — instead of inflating the first timed query rep
    for _ in range(2):
        eng.query({"filters": [{"p": "<p/type>", "o": "<c/region>"}], "size": 1,
                   "use_cache": False})
    out["build_s"] = round(time.perf_counter() - t0, 3)
    graph_holder.append(graph)
    out["triples"] = graph.triples.count()
    queries: dict = {}
    sigs: dict = {}
    for name, opts in OPTS_QUERIES.items():
        o = dict(opts)
        o["use_cache"] = False
        back_holder: list = []

        def call(o=o, h=back_holder):
            h.clear()
            h.append(eng.query(dict(o)))

        queries[name] = _timed_reps(call, reps)
        sigs[name] = _query_signature(back_holder[0])

    queries["api_total"] = _timed_reps(lambda: eng.total(), reps)
    sigs["api_total"] = {"total": eng.total()}

    def props():
        return {r["val"]: r["count"] for r in eng.properties().collect()}

    queries["api_properties"] = _timed_reps(props, reps)
    sigs["api_properties"] = {"properties": dict(sorted(props().items()))}

    def cbp():
        return {r["val"]: r["count"] for r in eng.count_by_property("<p/type>").collect()}

    queries["api_count_by_property"] = _timed_reps(cbp, reps)
    sigs["api_count_by_property"] = {"counts": dict(sorted(cbp().items()))}

    queries["api_sp_batch"] = _timed_reps(lambda: eng.sp(SP_BATCH, "<p/name>"), reps)
    sp_res = eng.sp(SP_BATCH, "<p/name>")
    sigs["api_sp_batch"] = {"sp": {k: sorted(map(str, v)) for k, v in sp_res.items()}}
    queries["api_spo"] = _timed_reps(
        lambda: eng.spo("<e/customer/1>", None, None), reps
    )
    out["queries"] = queries
    out["signatures"] = sigs
    spark.stop()
    return out


def _drop_page_cache() -> bool:
    """Drop the OS page cache (needs root). The r13 runs showed
    back-to-back head-to-heads hand the REFERENCE a warm-cache
    advantage swing (its ~18 GB of DuckDB/tmp files from run A stay in
    cache for run B: property_hop 6.91 -> 2.20 s reference-side while
    ours stayed flat, moving the geomean ~0.2) — cache state, not
    engine state. Dropping between engines makes both start cold."""
    try:
        os.sync()
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
        return True
    except OSError:
        return False


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default=str(REPO / "docs" / "BASELINE_MEASURED.json"))
    ap.add_argument("--keep", action="store_true", help="keep the workdir (dump + ref db)")
    ap.add_argument("--drop-caches", action="store_true",
                    help="drop the OS page cache before each engine (r14 protocol: "
                         "removes the reference-side warmth a prior run leaves behind)")
    ap.add_argument("--order", choices=["ours-first", "ref-first"], default="ours-first",
                    help="engine execution order (alternate between runs as the "
                         "cache-fairness lever when --drop-caches is unavailable)")
    args = ap.parse_args()

    sf_name = Path(args.sf).name
    workdir = REPO / ".refbase" / sf_name
    workdir.mkdir(parents=True, exist_ok=True)

    parts = ensure_dump(args.sf, workdir)
    if not parts:
        raise SystemExit("no dump parts written")
    gc.collect()

    dropped = []
    if args.order == "ours-first":
        if args.drop_caches:
            dropped.append(_drop_page_cache())
        ours = run_ours(parts, args.reps)
        gc.collect()
        if args.drop_caches:
            dropped.append(_drop_page_cache())
        ref = run_reference(parts, workdir, args.reps)
    else:
        if args.drop_caches:
            dropped.append(_drop_page_cache())
        ref = run_reference(parts, workdir, args.reps)
        gc.collect()
        if args.drop_caches:
            dropped.append(_drop_page_cache())
        ours = run_ours(parts, args.reps)

    parity = {}
    for name in ref["signatures"]:
        r = ref["signatures"][name]
        o = ours["signatures"].get(name)
        parity[name] = r == o
        if not parity[name]:
            parity[name + "__detail"] = {"reference": r, "ours": o}

    doc = {
        "sf_dir": args.sf,
        "sf": sf_name,
        "generated_by": "tools/run_reference_baseline.py",
        "protocol": {
            "order": args.order,
            "drop_caches": args.drop_caches,
            "drop_caches_ok": all(dropped) if dropped else None,
        },
        "reference": {k: v for k, v in ref.items() if k != "signatures"},
        "bikidata_spark": {k: v for k, v in ours.items() if k != "signatures"},
        "parity": parity,
        "notes": [
            "Same gzipped N-Triples dump, same JSON opts, each engine's native serving call.",
            "Reference runs unmodified from /root/reference/src with tools/refshim (ctypes libxxhash, cohere import stub).",
            "FTS/semantic excluded on both sides: DuckDB fts extension + Cohere API are unavailable offline.",
            "hash_shim_build_overhead_s estimates how much the ctypes hash shim (vs the C-extension xxhash) inflates the reference build; subtract it for a favorable-to-reference build comparison.",
            "Query timings are median of N reps after one untimed warmup rep per engine.",
        ],
    }
    Path(args.out).write_text(json.dumps(doc, indent=2, default=str) + "\n")
    print(json.dumps({
        "out": args.out,
        "ref_build_s": ref["build_s"],
        "ours_build_s": ours["build_s"],
        "parity_fail": [k for k, v in parity.items() if v is False],
    }))
    if not args.keep:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
