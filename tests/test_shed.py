"""Dictionary/FTS shed under literal churn (r9 scale-hardening).

The FTS index is a pure function of the literal term dictionary, and
the dictionary never shrinks (reference semantics — query.py:505-507
never GCs terms). Sustained insert→delete literal churn through a
serving engine would therefore grow the terms table and the postings
without bound, even though the dead literals are unobservable through
every query surface. The shed GCs unreferenced terms once the dead
fraction passes the configured floors, bounding both — while keeping
BM25 results identical to a scratch engine on the same graph.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _mk_engine(spark):
    from bikidata_spark import Engine, from_string_quads

    rows = [
        ("<s/1>", "<p/lbl>", '"alpha document about graphs"', ""),
        ("<s/2>", "<p/lbl>", '"beta document about spark"', ""),
        ("<s/3>", "<p/lbl>", '"gamma document about graphs and spark"', ""),
        ("<s/1>", "<p/t>", "<t/0>", ""),
        ("<s/2>", "<p/t>", "<t/0>", ""),
    ]
    g = from_string_quads(
        spark.createDataFrame(rows, "s string, p string, o string, g string")
    ).cache()
    g.triples.count()
    eng = Engine(g)
    eng.query({"filters": [{"p": "<p/t>"}], "size": 1})  # warm tier
    return eng


def test_dead_literal_counter_tracks_churn_and_revival(spark):
    eng = _mk_engine(spark)
    o = '"churn candidate literal"'
    assert eng.mutate("insert", [{"s": "<c/1>", "p": "<p/t>", "o": o}])[
        "triples_inserted"
    ] == 1
    assert eng.cache_stats()["dead_literals"] == 0
    assert eng.mutate("delete", [{"s": "<c/1>", "p": "<p/t>", "o": o}])[
        "triples_deleted"
    ] == 1
    assert eng.cache_stats()["dead_literals"] == 1
    # deleting an IRI-object quad is not a dead LITERAL
    assert eng.mutate("delete", [{"s": "<s/1>", "p": "<p/t>", "o": "<t/0>"}])[
        "triples_deleted"
    ] == 1
    assert eng.cache_stats()["dead_literals"] == 1
    # a literal with a SECOND reference is not dead until the last one goes
    lbl = '"alpha document about graphs"'
    assert eng.mutate("insert", [{"s": "<c/2>", "p": "<p/lbl>", "o": lbl}])[
        "triples_inserted"
    ] == 1
    assert eng.mutate("delete", [{"s": "<c/2>", "p": "<p/lbl>", "o": lbl}])[
        "triples_deleted"
    ] == 1
    assert eng.cache_stats()["dead_literals"] == 1  # <s/1> still refers to it
    # re-inserting the dead literal revives it — the estimate decrements
    assert eng.mutate("insert", [{"s": "<c/3>", "p": "<p/t>", "o": o}])[
        "triples_inserted"
    ] == 1
    assert eng.cache_stats()["dead_literals"] == 0


def test_literal_churn_sheds_dictionary_and_postings(spark):
    from bikidata_spark import Engine

    eng = _mk_engine(spark)
    eng.shed_min_literals = 8  # test-sized floors
    eng.shed_fraction = 0.2
    base_terms = eng.graph.terms.count()
    eng.fts  # resident index: inserts extend it incrementally

    for i in range(20):
        o = f'"churned payload number {i} with tokens"'
        assert eng.mutate("insert", [{"s": f"<c/{i}>", "p": "<p/t>", "o": o}])[
            "triples_inserted"
        ] == 1
        assert eng.mutate("delete", [{"s": f"<c/{i}>", "p": "<p/t>", "o": o}])[
            "triples_deleted"
        ] == 1

    stats = eng.cache_stats()
    assert stats["terms_shed"] >= 2  # floors tripped repeatedly, not once
    # the dictionary is BOUNDED: the un-shed tail is at most the floor's
    # worth of dead literals plus their (also now unreferenced) subjects
    assert eng.graph.terms.count() <= base_terms + 2 * eng.shed_min_literals
    # force a final shed: now EVERY surviving term must be referenced
    eng._shed_dead_terms()
    t = eng.graph.triples
    refs = (
        t.select(F.col("s").alias("hash"))
        .unionAll(t.select(F.col("p").alias("hash")))
        .unionAll(t.select(F.col("o").alias("hash")))
        .unionAll(t.select(F.col("g").alias("hash")))
        .distinct()
    )
    assert eng.graph.terms.join(refs, "hash", "left_anti").count() == 0
    assert eng.graph.terms.count() == base_terms  # churn left no residue

    # postings bounded + BM25 equality: the shed engine's index equals a
    # scratch engine's on the same graph — same postings size, and the
    # same scored fts response byte-for-byte
    fresh = Engine(eng.graph)
    assert eng.fts.postings.count() == fresh.fts.postings.count()
    assert eng.fts.n_docs == fresh.fts.n_docs
    assert eng.fts.avgdl == pytest.approx(fresh.fts.avgdl, abs=0)
    q = {"filters": [{"p": "fts", "o": "graphs"}], "size": 10}
    a, b = eng.query(q), fresh.query(q)
    for r in (a, b):
        r.pop("msg_received_time", None)
        r.pop("msg_processed_time", None)
    assert a == b
    assert a["total"] >= 1  # base corpus still matches


def test_no_shed_below_floors(spark):
    """Default floors: a handful of deletes must NOT trigger the
    distributed GC (the zero-job mutation contract stays zero-job)."""
    eng = _mk_engine(spark)
    for i in range(5):
        o = f'"small churn {i}"'
        eng.mutate("insert", [{"s": f"<c/{i}>", "p": "<p/t>", "o": o}])
        eng.mutate("delete", [{"s": f"<c/{i}>", "p": "<p/t>", "o": o}])
    st = eng.cache_stats()
    assert st["terms_shed"] == 0
    assert st["dead_literals"] == 5
