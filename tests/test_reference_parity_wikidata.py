"""Cross-engine parity on a WIKIDATA-SHAPED dump.

The TPC-H-derived parity fixture (test_reference_parity.py) uses short
synthetic IRIs and plain literals; the reference engine's real target
is Wikidata-style RDF (reference README: wikidata truthy dumps;
main.py ingests full IRIs, language-tagged labels, datatyped
literals, \\uXXXX escapes). This module pins both engines on a dump
shaped like that target:

- full ``http://www.wikidata.org/entity/Q{n}`` / ``prop/direct/P{n}``
  IRIs (long, shared-prefix — exercises hashing + dictionary dedup on
  realistic key material),
- ``rdfs:label`` in en/de/fr with language tags, some with raw
  unicode and some with ``\\uXXXX`` escapes (exercises the
  unicode-escape decode path + the sort API's language ranking),
- ``skos:altLabel`` and ``schema:description`` literals,
- datatyped literals (xsd:dateTime birth dates, xsd:decimal
  populations),
- a P279 (subclass-of) hierarchy for hop filters and ``paths``.

Same skip conditions and harness as test_reference_parity.py.
"""

from __future__ import annotations

import importlib
import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
REFERENCE_SRC = "/root/reference/src"

WD = "http://www.wikidata.org/entity/"
WDT = "http://www.wikidata.org/prop/direct/"
RDFS_LABEL = "<http://www.w3.org/2000/01/rdf-schema#label>"
ALT_LABEL = "<http://www.w3.org/2004/02/skos/core#altLabel>"
DESCR = "<http://schema.org/description>"
P31 = f"<{WDT}P31>"  # instance of
P279 = f"<{WDT}P279>"  # subclass of
P19 = f"<{WDT}P19>"  # place of birth
P569 = f"<{WDT}P569>"  # date of birth
P1082 = f"<{WDT}P1082>"  # population
XSD_DT = "<http://www.w3.org/2001/XMLSchema#dateTime>"
XSD_DEC = "<http://www.w3.org/2001/XMLSchema#decimal>"

Q_HUMAN = f"<{WD}Q5>"
Q_CITY = f"<{WD}Q515>"
Q_SETTLEMENT = f"<{WD}Q486972>"  # human settlement (city's superclass)
Q_GEO = f"<{WD}Q2221906>"  # geographic location (settlement's superclass)

# deterministic "name" syllables — no RNG (repeatability is the point)
_SYL = ["ba", "ce", "di", "fo", "gu", "ha", "ki", "lo", "mu", "ne"]


def _name(i: int) -> str:
    return "".join(_SYL[int(d)] for d in str(i)).capitalize()


def wikidata_shaped_triples() -> list[str]:
    """~60 entities: 8 cities (Q515⊂Q486972⊂Q2221906) + 50 humans with
    multilingual labels, alt labels, descriptions, typed literals."""
    out: list[str] = []

    def t(s: str, p: str, o: str) -> None:
        out.append(f"{s} {p} {o} .")

    # class hierarchy (paths / hop targets)
    t(Q_CITY, P279, Q_SETTLEMENT)
    t(Q_SETTLEMENT, P279, Q_GEO)
    t(Q_CITY, RDFS_LABEL, '"city"@en')
    t(Q_CITY, RDFS_LABEL, '"Stadt"@de')
    t(Q_SETTLEMENT, RDFS_LABEL, '"human settlement"@en')
    t(Q_GEO, RDFS_LABEL, '"geographic location"@en')
    t(Q_HUMAN, RDFS_LABEL, '"human"@en')
    t(Q_HUMAN, RDFS_LABEL, '"Mensch"@de')

    cities = []
    for i in range(8):
        q = f"<{WD}Q{9000 + i}>"
        cities.append(q)
        t(q, P31, Q_CITY)
        t(q, RDFS_LABEL, f'"{_name(100 + i)}ville"@en')
        t(q, RDFS_LABEL, f'"{_name(100 + i)}stadt"@de')
        # population as xsd:decimal (typed literal parity)
        t(q, P1082, f'"{(i + 1) * 13577}"^^{XSD_DEC}')

    for i in range(50):
        q = f"<{WD}Q{100 + i}>"
        t(q, P31, Q_HUMAN)
        base = _name(200 + i)
        # en label with an escaped accent, de label raw, fr every 3rd
        t(q, RDFS_LABEL, f'"{base} Andr\\u00e9 {i}"@en')
        t(q, RDFS_LABEL, f'"{base} André {i}"@de')
        if i % 3 == 0:
            t(q, RDFS_LABEL, f'"{base} Andr\\u00E9 {i}"@fr')
        if i % 5 == 0:
            t(q, ALT_LABEL, f'"{base}y"@en')
        t(q, DESCR, f'"person number {i}"@en')
        t(q, P19, cities[i % len(cities)])
        t(q, P569, f'"19{50 + (i % 40):02d}-03-{(i % 27) + 1:02d}T00:00:00Z"^^{XSD_DT}')
    return out


OPTS = [
    # all humans, size-paged
    {"filters": [{"p": P31, "o": Q_HUMAN}], "size": 5},
    # humans born in city 9003, minus the Q100 id — must/not chain on
    # full Wikidata IRIs
    {
        "filters": [
            {"p": P31, "o": Q_HUMAN},
            {"op": "must", "p": P19, "o": f"<{WD}Q9003>"},
            {"op": "not", "p": "id", "o": f"<{WD}Q103>"},
        ],
        "size": 3,
    },
    # hop filter: entities whose P19 target is an instance of Q515 one
    # hop up (parents via P19)
    {"filters": [{"p": f"{P31[1:-1]}", "o": Q_CITY}], "size": 2},
    # facet humans by birthplace
    {
        "filters": [{"p": P31, "o": Q_HUMAN}],
        "aggregates": [P19],
        "size": 1,
    },
    # label-ordered paging over language-tagged multilingual labels
    {
        "filters": [{"p": P31, "o": Q_HUMAN}],
        "order": [{"by": "label", "dir": "desc"}],
        "size": 5,
        "start": 2,
    },
    # subclass chains: city → settlement → geographic location
    {
        "filters": [{"p": P31, "o": Q_CITY}],
        "paths": [P279],
        "size": 4,
    },
    # typed-literal object filter (exact xsd:decimal population match)
    {"filters": [{"p": P1082, "o": f'"13577"^^{XSD_DEC}'}], "size": 2},
]

# fix the hop-filter opts entry: reference syntax is "<iri> N"
OPTS[2] = {"filters": [{"p": f"{P31} 1", "o": Q_CITY}], "size": 2}

SP_BATCH = [f"<{WD}Q{100 + i}>" for i in range(3)]


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
        import xxhash

        xxhash.xxh64_hexdigest("probe")
        return True
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _reference_available(), reason="reference checkout / xxhash shim unavailable"
)


@pytest.fixture(scope="module")
def dump_nt(tmp_path_factory):
    path = tmp_path_factory.mktemp("wdparity") / "wikidata_shaped.nt"
    path.write_text("\n".join(wikidata_shaped_triples()) + "\n", encoding="utf-8")
    return str(path)


@pytest.fixture(scope="module")
def reference(dump_nt, tmp_path_factory):
    workdir = tmp_path_factory.mktemp("wdrefdb")
    os.environ["BIKIDATA_DB"] = str(workdir / "ref.duckdb")
    os.environ["BIKIDATA_TRIPLE_PATH"] = str(workdir / "triples.tmp")
    os.environ["BIKIDATA_MAP_PATH"] = str(workdir / "maps.tmp")
    os.environ.setdefault("COHERE_API_KEY", "")
    os.environ["DEBUG"] = "0"
    sys.path.insert(0, str(REPO / "tools" / "refshim"))
    sys.path.insert(0, REFERENCE_SRC)
    sys.path.insert(0, str(REPO / "tools"))
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
    except Exception as e:
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


@pytest.mark.parametrize("opts", OPTS, ids=[f"wd{i}" for i in range(len(OPTS))])
def test_query_signatures_match(reference, our_engine, opts):
    ref_back = reference.query(dict(opts))
    ours_back = our_engine.query({**opts, "use_cache": False})
    assert _signature(ref_back) == _signature(ours_back)


def test_label_page_values_match(reference, our_engine):
    """Beyond count signatures: the actual hydrated label VALUES of a
    label-ordered page must agree (exercises unicode-escape decode,
    lang-tag ranking, and lexical ordering on multilingual labels)."""
    opts = {
        "filters": [{"p": P31, "o": Q_HUMAN}],
        "order": [{"by": "label"}],
        "size": 6,
        "only_properties": [RDFS_LABEL],
    }
    ref_back = reference.query(dict(opts))
    ours_back = our_engine.query({**opts, "use_cache": False})
    def labels(back):
        return {
            iri: sorted(map(str, props.get(RDFS_LABEL, [])))
            for iri, props in back.get("results", {}).items()
        }
    assert labels(ref_back) == labels(ours_back)
    assert list(ref_back["results"].keys()) == list(ours_back["results"].keys())


def test_api_surface_matches(reference, our_engine):
    assert reference.total() == our_engine.total()
    ref_props = dict(sorted(reference.properties().items()))
    our_props = dict(
        sorted((r["val"], r["count"]) for r in our_engine.properties().collect())
    )
    assert ref_props == our_props
    ref_cbp = dict(sorted(reference.count_by_property(P31).items()))
    our_cbp = dict(
        sorted((r["val"], r["count"]) for r in our_engine.count_by_property(P31).collect())
    )
    assert ref_cbp == our_cbp
    ref_sp = {
        k: sorted(map(str, v)) for k, v in reference.sp(SP_BATCH, RDFS_LABEL).items()
    }
    our_sp = {
        k: sorted(map(str, v)) for k, v in our_engine.sp(SP_BATCH, RDFS_LABEL).items()
    }
    assert ref_sp == our_sp
