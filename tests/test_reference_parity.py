"""Cross-engine parity gate: the ACTUAL reference implementation
(DuckDB engine at /root/reference) vs bikidata_spark on the same tiny
N-Triples dump and the same JSON query opts.

This is the pytest-sized version of tools/run_reference_baseline.py —
a third independent oracle (beyond the DuckDB SQL mirrors and unit
tests): if the reference disagrees with us on totals, facet
aggregates, properties counts, or sp() values, a semantics drift has
crept in. Skipped cleanly when the reference checkout or the system
libxxhash is unavailable.
"""

from __future__ import annotations

import importlib
import os
import sys
from pathlib import Path

import pytest

from conftest import SF_DIR

REPO = Path(__file__).resolve().parent.parent
REFERENCE_SRC = "/root/reference/src"

OPTS = [
    {"filters": [{"p": "<p/mktsegment>", "o": '"BUILDING"'}], "size": 5},
    {
        "filters": [
            {"p": "<p/mktsegment>", "o": '"BUILDING"'},
            {"op": "must", "p": "<p/nation>", "o": "<e/nation/5>"},
            {"op": "not", "p": "<p/acctbal>", "o": '"0.00"'},
        ],
        "size": 3,
    },
    {"filters": [{"p": "<p/nation> 1", "o": "<e/nation/5>"}], "size": 2},
    {
        "filters": [{"p": "<p/mktsegment>", "o": '"BUILDING"'}],
        "aggregates": ["<p/nation>"],
        "size": 1,
    },
    {
        "filters": [{"p": "<p/type>", "o": "<c/customer>"}],
        "order": [{"by": "label", "dir": "desc"}],
        "size": 5,
        "start": 3,
    },
    {
        "filters": [{"p": "<p/mktsegment>", "o": '"BUILDING"'}],
        "paths": ["<p/parent>"],
        "size": 4,
    },
]

SP_BATCH = [f"<e/customer/{i}>" for i in range(1, 4)]


def _signature(back: dict) -> dict:
    sig = {"total": back.get("total"), "n_results": len(back.get("results", {}))}
    aggs = back.get("aggregates")
    if aggs:
        sig["aggregates"] = {
            k: sorted((int(c), str(v)) for c, v in vals) for k, vals in aggs.items()
        }
    return sig


def _reference_available() -> bool:
    if not os.path.isdir(REFERENCE_SRC):
        return False
    sys.path.insert(0, str(REPO / "tools" / "refshim"))
    try:
        import xxhash  # the refshim one (ctypes or pure-python fallback)

        xxhash.xxh64_hexdigest("probe")
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _reference_available(), reason="reference checkout / xxhash shim unavailable"
)


@pytest.fixture(scope="module")
def dump_nt(spark, tmp_path_factory):
    """One plain .nt file of the sf0.001 triplization (no graph field,
    like the reference's primary ingest format)."""
    from pyspark.sql import functions as F

    from bikidata_spark.sources.rdfize import string_quads

    path = tmp_path_factory.mktemp("refparity") / "dump.nt"
    rows = (
        string_quads(spark, SF_DIR)
        .select(F.concat_ws(" ", "s", "p", "o").alias("v"))
        .collect()
    )
    with open(path, "w") as fh:
        for r in rows:
            fh.write(r["v"] + " .\n")
    return str(path)


@pytest.fixture(scope="module")
def reference(dump_nt, tmp_path_factory):
    """The reference engine, built on the dump (offline shims; its two
    map-load statements rewritten for this DuckDB version — identical
    setup to tools/run_reference_baseline.py)."""
    workdir = tmp_path_factory.mktemp("refdb")
    os.environ["BIKIDATA_DB"] = str(workdir / "ref.duckdb")
    os.environ["BIKIDATA_TRIPLE_PATH"] = str(workdir / "triples.tmp")
    os.environ["BIKIDATA_MAP_PATH"] = str(workdir / "maps.tmp")
    os.environ.setdefault("COHERE_API_KEY", "")
    os.environ["DEBUG"] = "0"
    sys.path.insert(0, str(REPO / "tools" / "refshim"))
    sys.path.insert(0, REFERENCE_SRC)
    sys.path.insert(0, str(REPO / "tools"))
    # DB_PATH is bound at import time — force a fresh import under the
    # env just set, in case another module pulled bikidata in earlier
    for mod in [m for m in sys.modules if m == "bikidata" or m.startswith("bikidata.")]:
        del sys.modules[mod]
    import duckdb

    ref = importlib.import_module("bikidata")
    ref_main = importlib.import_module("bikidata.main")
    from run_reference_baseline import _ConnProxy

    class _DuckProxyModule:
        def __getattr__(self, name):
            return getattr(duckdb, name)

        @staticmethod
        def connect(*a, **k):
            return _ConnProxy(duckdb.connect(*a, **k))

    ref_main.duckdb = _DuckProxyModule()
    try:
        ref.build([dump_nt])
    except Exception as e:  # trailing create_fts_index pragma: no ext offline
        if "extension" not in str(e).lower() and "fts" not in str(e).lower():
            raise
    return ref


@pytest.fixture(scope="module")
def our_engine(spark, dump_nt):
    from bikidata_spark import Engine, from_string_quads
    from bikidata_spark.sources.ntriples import read_nt

    graph = from_string_quads(read_nt(spark, dump_nt)).cache()
    graph.triples.count()
    return Engine(graph)


@pytest.mark.parametrize("opts", OPTS, ids=[f"opts{i}" for i in range(len(OPTS))])
def test_query_signatures_match(reference, our_engine, opts):
    ref_back = reference.query(dict(opts))
    ours_back = our_engine.query({**opts, "use_cache": False})
    assert _signature(ref_back) == _signature(ours_back)


def test_api_surface_matches(reference, our_engine):
    assert reference.total() == our_engine.total()
    ref_props = dict(sorted(reference.properties().items()))
    our_props = dict(
        sorted((r["val"], r["count"]) for r in our_engine.properties().collect())
    )
    assert ref_props == our_props
    ref_cbp = dict(sorted(reference.count_by_property("<p/type>").items()))
    our_cbp = dict(
        sorted(
            (r["val"], r["count"])
            for r in our_engine.count_by_property("<p/type>").collect()
        )
    )
    assert ref_cbp == our_cbp
    ref_sp = {
        k: sorted(map(str, v)) for k, v in reference.sp(SP_BATCH, "<p/name>").items()
    }
    our_sp = {
        k: sorted(map(str, v)) for k, v in our_engine.sp(SP_BATCH, "<p/name>").items()
    }
    assert ref_sp == our_sp
