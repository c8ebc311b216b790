"""Zero-job mutations: Engine.mutate with a resident local tier must be
observably IDENTICAL to the distributed operators.mutations path —
result dicts, final store contents, and every downstream query surface
(reference handle_insert/handle_delete, query.py:468-617).

Two engines over independently-built copies of the same graph run the
same mutation script; after every step the result dicts must match,
and at the end the stores and a query battery compare equal. A third
check rebuilds the tier from the mutated DISTRIBUTED graph and compares
it against the PATCHED tier (LocalTier.patched) — catching any drift
between the driver-side patch and the lineage it mirrors.
"""

from __future__ import annotations

import random

import numpy as np
import pytest


def _mk_quads():
    rng = random.Random(77)
    label = "<http://www.w3.org/2000/01/rdf-schema#label>"
    quads = []
    words = ["alpha", "beta", "gamma", "delta"]
    for i in range(120):
        e = f"<m/{i}>"
        g = "" if i % 3 == 0 else f"<g/{i % 3}>"
        quads.append((e, "<p/type>", f"<t/{i % 4}>", g))
        if i % 5 != 0:
            quads.append((e, label, f'"Entity {i:03d}"@en', g))
        if i % 2 == 0:
            quads.append((e, "<p/desc>", f'"{" ".join(rng.sample(words, 2))} item {i}"', g))
        quads.append((e, "<p/peer>", f"<m/{(i + 7) % 120}>", g))
    # a duplicated stored quad (sources can contain them; delete guards
    # count stored ROWS, so this exercises the n_match mirror)
    quads.append(("<m/dup>", "<p/type>", "<t/0>", ""))
    quads.append(("<m/dup>", "<p/type>", "<t/0>", ""))
    return quads


def _mk_engine(spark, tier: bool):
    from bikidata_spark import Engine, from_string_quads

    quads = spark.createDataFrame(_mk_quads(), "s string, p string, o string, g string")
    graph = from_string_quads(quads).cache()
    graph.triples.count()
    eng = Engine(graph, local_tier_rows=(4_000_000 if tier else 0))
    if tier:
        assert eng._local_tier() is not None
    return eng


QUERY_BATTERY = [
    {"filters": [{"p": "<p/type>", "o": "<t/1>"}], "size": 500},
    {"filters": [{"p": "<p/new>", "o": '"fresh lit"'}], "size": 10},
    {"filters": [{"p": "fts", "o": "alpha"}], "size": 25},
    {"filters": [{"p": "fts", "o": "zulu"}], "size": 25},
    {"filters": [{"p": "<p/type>"}], "size": 10, "order": {"by": "label"}},
    {"size": 0, "aggregates": ["properties", "graphs", "<p/type>"]},
    {"filters": [{"p": "<p/peer> 2", "o": "<m/20>"}], "size": 500},
]

# (action, data, are_hashes) — exercises new terms, named graphs, dup
# and missing guards, wildcard deletes, and validation errors
SCRIPT = [
    ("insert", [{"s": "<m/new1>", "p": "<p/new>", "o": '"fresh lit"'}], False),
    ("insert", [{"s": "<m/new1>", "p": "<p/new>", "o": '"fresh lit"'}], False),  # dup
    (
        "insert",
        [
            {"s": "<m/new2>", "p": "<p/new>", "o": '"fresh lit"', "g": "<g/1>"},
            {"s": "<m/new2>", "p": "<p/type>", "o": "<t/1>", "g": "<g/9>"},
            {"s": "_:b1", "p": "<p/new>", "o": "_:b2"},
        ],
        False,
    ),
    ("insert", [{"s": "bad", "p": "<p/new>", "o": '"x"'}], False),  # validation
    ("insert", [{"s": "<m/v>", "p": "nop", "o": '"x"'}], False),  # validation
    ("insert", [{"s": "<m/new3>", "p": "<p/desc>", "o": '"zulu item 999"'}], False),
    ("delete", [{"s": "<m/new1>", "p": "<p/new>", "o": '"fresh lit"'}], False),
    ("delete", [{"s": "<m/new1>", "p": "<p/new>", "o": '"fresh lit"'}], False),  # missing
    ("delete", [{"s": "<m/nosuch>", "p": "<p/type>"}], False),  # wildcard missing
    ("delete", [{"s": "<m/new2>", "p": "<p/new>"}], False),  # wildcard, named graph? (g="")
    ("delete", [{"s": "<m/new2>", "p": "<p/new>", "o": '"fresh lit"', "g": "<g/1>"}], False),
    ("delete", [{"s": "<m/7>", "p": "<p/peer>", "o": "<m/14>", "g": "<g/1>"}], False),
    ("delete", [{"s": "<m/dup>", "p": "<p/type>", "o": "<t/0>"}], False),  # hits 2 rows
    (
        # mixed batch: with_o + wildcard in one call (guard runs on the
        # post-with_o frame)
        "delete",
        [
            {"s": "<m/9>", "p": "<p/peer>", "o": "<m/16>", "g": ""},
            {"s": "<m/new3>", "p": "<p/desc>"},
        ],
        False,
    ),
]


def _store_state(eng):
    t = sorted(map(tuple, eng.graph.triples.collect()))
    terms = sorted(map(tuple, eng.graph.terms.collect()))
    return t, terms


@pytest.fixture(scope="module")
def mutated_pair(spark):
    """Run the script against both engines, collecting step results."""
    tiered = _mk_engine(spark, tier=True)
    plain = _mk_engine(spark, tier=False)
    # warm the tier so the patch path (not a rebuild) is what's tested
    tiered.query({"filters": [{"p": "<p/type>", "o": "<t/0>"}], "size": 1})
    steps = []
    for action, data, are_hashes in SCRIPT:
        a = tiered.mutate(action, [dict(d) for d in data], are_hashes=are_hashes)
        b = plain.mutate(action, [dict(d) for d in data], are_hashes=are_hashes)
        steps.append((action, data, a, b))
    return tiered, plain, steps


def test_step_results_identical(mutated_pair):
    for action, data, a, b in mutated_pair[2]:
        assert a == b, f"{action} {data}: tier={a} distributed={b}"


def test_final_store_identical(mutated_pair):
    tiered, plain, _ = mutated_pair
    assert _store_state(tiered) == _store_state(plain)


def test_queries_identical_after_script(mutated_pair):
    tiered, plain, _ = mutated_pair
    assert tiered._local_tier() is not None  # still resident, patched
    for opts in QUERY_BATTERY:
        ours = tiered.query(dict(opts))
        theirs = plain.query({**opts, "use_cache": False})
        assert ours == theirs, f"diverged on {opts}"


def _live_cols(t):
    """Quad columns net of overlay tombstones (tail rows included —
    they live in the flat prefix views)."""
    sel = t._live if t._live is not None else slice(None)
    return t.s[sel], t.p[sel], t.o[sel], t.g[sel]


def test_patched_tier_equals_rebuilt_tier(mutated_pair):
    """The patched mirror must equal one re-collected from the mutated
    distributed graph, row-set and dictionary both."""
    tiered, _, _ = mutated_pair
    patched = tiered._local_tier()
    from bikidata_spark.plans.local_tier import build_local_tier

    rebuilt = build_local_tier(tiered, tiered.local_tier_rows)
    ps, pp, po, pg = _live_cols(patched)
    a = np.lexsort((pg, po, pp, ps))
    b = np.lexsort((rebuilt.g, rebuilt.o, rebuilt.p, rebuilt.s))
    for pc, rc, name in (
        (ps, rebuilt.s, "s"), (pp, rebuilt.p, "p"),
        (po, rebuilt.o, "o"), (pg, rebuilt.g, "g"),
    ):
        assert np.array_equal(pc[a], rc[b]), name
    # rebuilt dictionaries may lack terms the patch added for since-
    # deleted triples? No: terms are never garbage-collected — the
    # distributed terms frame keeps them, so the dicts must MATCH.
    assert patched.terms.to_dict() == rebuilt.terms.to_dict()
    assert patched.terms.lit_set() == rebuilt.terms.lit_set()
    # overlay invariants: the sorted indexes cover EXACTLY the base
    # region as a stable argsort (ties ordered by row id — the property
    # every searchsorted probe and the sp() stored-order contract rely
    # on); the unsorted tail is all overlay inserts, all live
    base = patched._sorted_n
    assert np.array_equal(
        patched._s_order, np.argsort(patched.s[:base], kind="stable")
    )
    assert np.array_equal(patched._s_sorted, patched.s[:base][patched._s_order])
    assert np.array_equal(
        patched._o_order, np.argsort(patched.o[:base], kind="stable")
    )
    assert np.array_equal(patched._o_sorted, patched.o[:base][patched._o_order])
    if patched._live is not None:
        assert int((~patched._live).sum()) == patched._n_dead
    assert patched.live_rows == rebuilt.nrows
    # TermDict invariants: base hash array sorted; the mutation-minted
    # overlay is disjoint from the base (it merges at the next fold;
    # values_of resolves overlay hashes through the dict meanwhile);
    # rank order IS value order (the int-rank page sort depends on it)
    td = patched.terms
    assert np.array_equal(td.th, np.sort(td.th))
    base_hashes = set(td.th.tolist())
    assert not (base_hashes & set(td.extra))
    dv = td.decode(np.argsort(td.ranks(), kind="stable"))
    assert list(dv) == sorted(dv)


def test_overlay_folds_and_stays_identical(spark, monkeypatch):
    """With OVERLAY_FOLD forced tiny, every few mutations trigger a
    physical fold (compaction + fresh argsort). The folded tier must be
    indistinguishable: same script differential vs the distributed
    engine, and post-fold the overlay is clear with full-coverage
    indexes."""
    from bikidata_spark.plans.local_tier import LocalTier

    monkeypatch.setattr(LocalTier, "OVERLAY_FOLD", 2)
    tiered = _mk_engine(spark, tier=True)
    plain = _mk_engine(spark, tier=False)
    tiered.query({"filters": [{"p": "<p/type>", "o": "<t/0>"}], "size": 1})
    for action, data, are_hashes in SCRIPT:
        a = tiered.mutate(action, [dict(d) for d in data], are_hashes=are_hashes)
        b = plain.mutate(action, [dict(d) for d in data], are_hashes=are_hashes)
        assert a == b, f"{action} {data}"
    assert _store_state(tiered) == _store_state(plain)
    for opts in QUERY_BATTERY:
        ours = tiered.query(dict(opts))
        theirs = plain.query({**opts, "use_cache": False})
        assert ours == theirs, f"diverged on {opts}"
    # one more 3-row batch: pending (2 tombstones + 3 inserts) > 2 →
    # deterministic fold on this very patch
    batch = [
        {"s": f"<fold/x{i}>", "p": "<p/foldx>", "o": f"<t/{i}>"} for i in range(3)
    ]
    assert tiered.mutate("insert", [dict(d) for d in batch]) == plain.mutate(
        "insert", [dict(d) for d in batch]
    )
    assert _store_state(tiered) == _store_state(plain)
    t = tiered._local_tier()
    assert t._live is None and t._n_dead == 0 and t._sorted_n == t.nrows
    assert not t.terms.extra  # term overlay merged by the fold
    assert np.array_equal(t.terms.th, np.sort(t.terms.th))
    # fold carried/derived ranks must still mirror value order
    dv = t.terms.decode(np.argsort(t.terms.ranks(), kind="stable"))
    assert list(dv) == sorted(dv)
    assert np.array_equal(t._s_order, np.argsort(t.s, kind="stable"))
    assert np.array_equal(t._o_order, np.argsort(t.o, kind="stable"))


def test_tier_mutation_is_zero_jobs(spark):
    eng = _mk_engine(spark, tier=True)
    eng.query({"filters": [{"p": "<p/type>", "o": "<t/0>"}], "size": 1})  # warm
    sc = spark.sparkContext
    sc.setJobGroup("mutate-zero-jobs", "probe")
    try:
        r1 = eng.mutate("insert", [{"s": "<z/1>", "p": "<p/z>", "o": '"zz top"'}])
        r2 = eng.mutate("delete", [{"s": "<z/1>", "p": "<p/z>"}])
        r3 = eng.query({"filters": [{"p": "<p/type>", "o": "<t/1>"}], "size": 2})
        jobs = sc.statusTracker().getJobIdsForGroup("mutate-zero-jobs")
    finally:
        sc.setJobGroup(None, None)
    assert r1 == {"triples_inserted": 1, "terms_inserted": 3}
    assert r2 == {"triples_deleted": 1}
    assert r3["total"] > 0
    assert list(jobs) == []


def test_hash_addressed_delete_through_tier(spark):
    """are_hashes deletes: decimal, hex-digest, and unsigned forms, with
    and without o — tier path vs distributed path."""
    from bikidata_spark.functions.xxh import term_id, xxh64

    tiered = _mk_engine(spark, tier=True)
    plain = _mk_engine(spark, tier=False)
    tiered.query({"filters": [{"p": "<p/type>", "o": "<t/0>"}], "size": 1})
    s, p, o = term_id("<m/3>"), term_id("<p/peer>"), term_id("<m/10>")
    batches = [
        [{"s": str(s), "p": str(p), "o": str(o)}],  # decimal signed
        [{"s": f"{xxh64('<m/4>'.encode()):016x}", "p": f"{xxh64(b'<p/peer>'):016x}"}],  # hex, wildcard o
        [{"s": str(term_id("<m/6>") & (2**64 - 1)), "p": str(term_id("<p/type>"))}],  # unsigned
        [{"s": str(term_id("<m/nosuch>")), "p": str(p)}],  # no match: 0 rows, no error
    ]
    for data in batches:
        a = tiered.mutate("delete", [dict(d) for d in data], are_hashes=True)
        b = plain.mutate("delete", [dict(d) for d in data], are_hashes=True)
        assert a == b
    assert _store_state(tiered) == _store_state(plain)
    for opts in QUERY_BATTERY[:3]:
        assert tiered.query(dict(opts)) == plain.query({**opts, "use_cache": False})


def test_insert_past_cap_demotes_tier(spark):
    from bikidata_spark import Engine, from_string_quads

    quads = spark.createDataFrame(
        [(f"<c/{i}>", "<p>", f'"v{i}"', "") for i in range(10)],
        "s string, p string, o string, g string",
    )
    eng = Engine(from_string_quads(quads).cache(), local_tier_rows=11)
    assert eng._local_tier() is not None
    r = eng.mutate("insert", [{"s": "<c/a>", "p": "<p>", "o": '"va"'}])  # 11 rows: at cap
    assert r["triples_inserted"] == 1
    assert eng._local_tier() is not None
    r = eng.mutate("insert", [{"s": "<c/b>", "p": "<p>", "o": '"vb"'}])  # 12 > cap
    assert r["triples_inserted"] == 1
    st = eng._local_tier_state
    assert st[0] == eng._graph_generation and st[1] is None  # demoted, not stale
    assert eng.query({"filters": [{"p": "<p>", "o": '"vb"'}]})["total"] == 1


def test_serving_mutations_keep_tier_warm(spark):
    """The serving facade routes through Engine.mutate: after an
    insert+delete cycle the tier is still resident and generation-
    fresh (no re-collect on the next query)."""
    import asyncio

    from bikidata_spark.serving import Serving

    eng = _mk_engine(spark, tier=True)
    eng.query({"filters": [{"p": "<p/type>", "o": "<t/0>"}], "size": 1})
    srv = Serving(eng, num_workers=2)

    async def run():
        r1 = await srv.insert_async("<w/1>", "<p/w>", '"warm"')
        r2 = await srv.query_async({"filters": [{"p": "<p/w>", "o": '"warm"'}]})
        r3 = await srv.delete_async("<w/1>", "<p/w>", '"warm"')
        return r1, r2, r3

    r1, r2, r3 = asyncio.run(run())
    srv.close()
    assert r1["triples_inserted"] == 1
    assert r2["total"] == 1
    assert r3["triples_deleted"] == 1
    st = eng._local_tier_state
    assert st is not None and st[0] == eng._graph_generation and st[1] is not None


def test_fts_index_survives_nonliteral_mutations(spark):
    """The FTS index is a function of the literal term dictionary: a
    delete or an IRI-only insert must NOT drop it (no rebuild on the
    next fts query), while an insert minting a new literal term must.
    Scores after preservation must equal a from-scratch engine's."""
    tiered = _mk_engine(spark, tier=True)
    r0 = tiered.query({"filters": [{"p": "fts", "o": "alpha"}], "size": 5})
    fts0 = tiered._fts
    assert fts0 is not None
    tier0 = tiered._local_tier()
    assert tiered.mutate("insert", [{"s": "<k/1>", "p": "<p/peer>", "o": "<m/1>"}]) == {
        "triples_inserted": 1,
        "terms_inserted": 1,
    }
    assert tiered.mutate("delete", [{"s": "<k/1>", "p": "<p/peer>"}])["triples_deleted"] == 1
    assert tiered._fts is fts0  # preserved across both swaps
    # the tier's lazy fts mirror carried over too (no re-collect)
    assert tiered._local_tier()._fts_state is tier0._fts_state
    r1 = tiered.query({"filters": [{"p": "fts", "o": "alpha"}], "size": 5, "use_cache": False})
    fresh = _mk_engine(spark, tier=True)
    r2 = fresh.query({"filters": [{"p": "fts", "o": "alpha"}], "size": 5})
    assert r1 == r0 == r2  # BM25 scores identical to a from-scratch build
    # a NEW literal term extends the index in place (incremental path —
    # test_incremental_fts_equals_rebuild pins exactness); the next fts
    # query must see the new doc
    tiered.mutate("insert", [{"s": "<k/2>", "p": "<p/desc>", "o": '"alpha kappa item"'}])
    assert tiered._fts is not None and tiered._fts is not fts0
    r3 = tiered.query({"filters": [{"p": "fts", "o": "kappa"}], "size": 5, "use_cache": False})
    assert r3["total"] == 1
    plain = Engine_of(tiered)
    r4 = plain.query({"filters": [{"p": "fts", "o": "kappa"}], "size": 5, "use_cache": False})
    assert r3 == r4


def Engine_of(eng):
    """Distributed-only engine over the SAME (post-mutation) graph."""
    from bikidata_spark import Engine

    return Engine(eng.graph, local_tier_rows=0)


def test_wildcard_delete_then_insert_keeps_columns(spark):
    """A USING-join (wildcard delete's ["s","p","g"] anti-join) moves
    its keys to the front of the output; without a canonical re-select
    the NEXT insert's positional unionAll writes o into the g column —
    on the tier path AND the distributed operators path. Pin both."""
    from bikidata_spark.functions.xxh import term_id

    for tier in (True, False):
        eng = _mk_engine(spark, tier=tier)
        if tier:
            eng.query({"filters": [{"p": "<p/type>", "o": "<t/0>"}], "size": 1})
        assert eng.mutate("insert", [{"s": "<w/1>", "p": "<p/w>", "o": '"wv"'}])[
            "triples_inserted"
        ] == 1
        assert eng.mutate("delete", [{"s": "<w/1>", "p": "<p/w>"}])["triples_deleted"] == 1
        assert eng.graph.triples.columns == ["s", "p", "o", "g"]
        assert eng.mutate("insert", [{"s": "<w/2>", "p": "<p/w>", "o": '"wv2"'}])[
            "triples_inserted"
        ] == 1
        row = [
            tuple(r)
            for r in eng.graph.triples.filter(
                eng.graph.triples.s == term_id("<w/2>")
            ).collect()
        ]
        assert row == [
            (term_id("<w/2>"), term_id("<p/w>"), term_id('"wv2"'), term_id(""))
        ], f"tier={tier}: {row}"
        # hash-addressed wildcard path too
        assert eng.mutate(
            "delete", [{"s": str(term_id("<w/2>")), "p": str(term_id("<p/w>"))}],
            are_hashes=True,
        )["triples_deleted"] == 1
        assert eng.graph.triples.columns == ["s", "p", "o", "g"]


def test_incremental_fts_equals_rebuild(spark):
    """A literal insert EXTENDS the built FTS index incrementally
    (FtsIndex.with_new_literals — one request-sized job) instead of
    dropping it; BM25 results must equal a from-scratch engine over the
    same mutated graph EXACTLY (df/N/avgdl all shift with new docs).
    The tier's postings mirror is patched, not re-collected."""
    tiered = _mk_engine(spark, tier=True)
    r = tiered.query({"filters": [{"p": "fts", "o": "alpha"}], "size": 5})
    assert r["total"] > 0
    fts0 = tiered._fts
    assert fts0 is not None
    mirror0 = tiered._local_tier()._fts_state
    assert mirror0 is not None and mirror0[1] is not None
    # bumps an existing token's df (alpha), mints new tokens (kappa,
    # etude via accent strip), tf>1 (kappa kappa), two new docs
    sc = spark.sparkContext
    sc.setJobGroup("lit-insert-zero-jobs", "probe")
    try:
        res = tiered.mutate(
            "insert",
            [
                {"s": "<f/1>", "p": "<p/desc>", "o": '"Alpha kappa kappa ÉTUDE item"'},
                {"s": "<f/2>", "p": "<p/desc>", "o": '"kappa beta"'},
            ],
        )
        jobs = sc.statusTracker().getJobIdsForGroup("lit-insert-zero-jobs")
    finally:
        sc.setJobGroup(None, None)
    assert list(jobs) == []  # tokenization is driver-side — no job even here
    assert res["triples_inserted"] == 2
    assert tiered._fts is not None and tiered._fts is not fts0  # updated in place
    assert len(tiered._fts._incr_state["rows"]) > 0  # buffered increment
    st = tiered._local_tier()._fts_state
    assert st is not None and st[0] is tiered._fts and st[1] is not None
    assert st[1] is not mirror0[1]  # patched copy, not the stale mirror
    fresh = Engine_of(tiered)  # rebuilds everything from scratch
    for q in ("alpha", "kappa", "alpha beta", "étude", "beta gamma item", "kappa beta"):
        a = tiered.query({"filters": [{"p": "fts", "o": q}], "size": 25, "use_cache": False})
        b = fresh.query({"filters": [{"p": "fts", "o": q}], "size": 25, "use_cache": False})
        assert a == b, f"diverged on fts {q!r}"
    # a SECOND literal batch: increments accumulate against the SAME
    # pre-increment base frames (constant plan depth, no union chain)
    base_postings = tiered._fts._incr_state["postings"]
    tiered.mutate("insert", [{"s": "<f/9>", "p": "<p/desc>", "o": '"kappa rho"'}])
    assert tiered._fts._incr_state["postings"] is base_postings
    fresh_b = Engine_of(tiered)
    for q in ("kappa", "rho", "kappa beta"):
        a = tiered.query({"filters": [{"p": "fts", "o": q}], "size": 25, "use_cache": False})
        b = fresh_b.query({"filters": [{"p": "fts", "o": q}], "size": 25, "use_cache": False})
        assert a == b, f"diverged on fts {q!r} after second batch"
    # a token-free literal leaves the corpus unchanged: same index object
    f1 = tiered._fts
    tiered.mutate("insert", [{"s": "<f/3>", "p": "<p/desc>", "o": '"..."'}])
    assert tiered._fts is f1
    # stats must still match a rebuild after the no-op
    fresh2 = Engine_of(tiered)
    assert (tiered.fts.n_docs, tiered.fts.avgdl) == (fresh2.fts.n_docs, fresh2.fts.avgdl)


def test_order_caches_carry_across_disjoint_mutations(spark):
    """The tier's order-key maps / global page orders survive mutations
    that provably can't affect them (edge on an existing subject,
    non-footprint property) and are dropped + rebuilt correctly when
    they could (label change, new subject, vanished subject)."""
    label = "<http://www.w3.org/2000/01/rdf-schema#label>"
    tiered = _mk_engine(spark, tier=True)
    plain = _mk_engine(spark, tier=False)
    opts = {
        "filters": [{"p": "<p/type>", "o": "<t/1>"}],
        "size": 400,
        "order": {"by": "label"},
        "use_cache": False,
    }

    def both(action, data):
        a = tiered.mutate(action, [dict(d) for d in data])
        b = plain.mutate(action, [dict(d) for d in data])
        assert a == b and "error" not in a, (a, b)

    def check():
        assert tiered.query(dict(opts)) == plain.query(dict(opts))

    tiered.query(dict(opts))
    assert tiered._local_tier()._global_orders
    # 1. edge insert on an EXISTING subject, non-label property → carried
    both("insert", [{"s": "<m/1>", "p": "<p/peer>", "o": "<m/2>"}])
    assert tiered._local_tier()._global_orders, "cache should carry"
    check()
    # 2. label insert on an existing UNLABELED subject → dropped, and the
    # rebuilt order must place it by its new label (staleness detector:
    # a wrongly-carried cache would leave it in the nulls bucket)
    both("insert", [{"s": "<m/5>", "p": label, "o": '"AAA comes first"@en'}])
    assert not tiered._local_tier()._global_orders, "label change must drop"
    check()
    # 3. brand-new subject (non-label property) → dropped (it must
    # appear in the order's nulls bucket)
    tiered.query(dict(opts))
    assert tiered._local_tier()._global_orders
    both("insert", [{"s": "<m/brandnew>", "p": "<p/type>", "o": "<t/1>"}])
    assert not tiered._local_tier()._global_orders, "new subject must drop"
    check()
    # 4. delete non-footprint edge on existing subject → carried
    tiered.query(dict(opts))
    both("delete", [{"s": "<m/1>", "p": "<p/peer>", "o": "<m/2>"}])
    assert tiered._local_tier()._global_orders, "cache should carry"
    check()
    # 5. subject vanishes entirely (delete its every row) → dropped
    both("delete", [{"s": "<m/brandnew>", "p": "<p/type>"}])
    assert not tiered._local_tier()._global_orders, "vanished subject must drop"
    check()


def test_mutation_buffers_fold_into_checkpointed_base(spark):
    """Past mutation_fold_rows buffered entries the delta folds into a
    localCheckpointed base (constant-depth plans stay constant); store
    contents and queries must be unaffected."""
    tiered = _mk_engine(spark, tier=True)
    tiered.mutation_fold_rows = 6
    plain = _mk_engine(spark, tier=False)
    plain.mutation_fold_rows = 0  # distributed control, no folding
    tiered.query({"filters": [{"p": "<p/type>", "o": "<t/0>"}], "size": 1})
    for i in range(10):
        a = tiered.mutate("insert", [{"s": f"<fold/{i}>", "p": "<p/fold>", "o": f"<t/{i % 3}>"}])
        b = plain.mutate("insert", [{"s": f"<fold/{i}>", "p": "<p/fold>", "o": f"<t/{i % 3}>"}])
        assert a == b
        if i % 3 == 2:
            a = tiered.mutate("delete", [{"s": f"<fold/{i}>", "p": "<p/fold>"}])
            b = plain.mutate("delete", [{"s": f"<fold/{i}>", "p": "<p/fold>"}])
            assert a == b
    # the fold fired at least once: buffers were reset mid-script
    st = tiered._mut_state
    assert st is None or (len(st["ins"]) + len(st["del4"]) + len(st["del3"])) < 13
    assert _store_state(tiered) == _store_state(plain)
    for opts in QUERY_BATTERY[:2] + [{"filters": [{"p": "<p/fold>"}], "size": 50}]:
        ours = tiered.query(dict(opts))
        theirs = plain.query({**opts, "use_cache": False})
        assert ours == theirs, f"diverged on {opts}"


def test_mutation_telemetry_in_stats(spark):
    eng = _mk_engine(spark, tier=True)
    eng.query({"filters": [{"p": "fts", "o": "alpha"}], "size": 1})
    eng.mutate("insert", [{"s": "<tm/1>", "p": "<p/t>", "o": '"teletext"'}])
    eng.mutate("delete", [{"s": "<tm/1>", "p": "<p/t>"}])
    st = eng.cache_stats()["local_tier"]
    assert st["state"] == "active"
    assert st["mutations_patched"] == 2
    assert st["fts_incremental_updates"] == 1  # the literal insert
    # the delete removed the pending insert from the buffer and left
    # one wildcard delete pattern targeting the base
    assert st["buffered_delta_rows"] == 1


def test_insert_on_bucketed_store_graph_aligns_terms(spark, tmp_path):
    """A graph read back from a persisted store carries the derived
    ``bucket`` partition column on its terms dictionary; the distributed
    insert path must derive it for new terms (align_terms) instead of
    positionally unioning a 4-column frame into a 5-column schema.
    Pins: schema preserved, bucket value follows the pmod rule, and the
    new literal resolves end-to-end through an Engine over the store."""
    from bikidata_spark import Engine, from_string_quads, read_graph, write_graph
    from bikidata_spark.functions.xxh import term_id
    from bikidata_spark.graph import TERM_BUCKETS, align_terms
    from bikidata_spark.operators import mutations as M

    quads = spark.createDataFrame(
        [(f"<e/{i}>", "<p/a>", f'"v{i}"', "") for i in range(5)],
        "s string, p string, o string, g string",
    )
    write_graph(from_string_quads(quads), str(tmp_path / "g"))
    g = read_graph(spark, str(tmp_path / "g"))
    assert "bucket" in g.terms.columns
    g2, stats = M.insert(g, [{"s": "<e/new>", "p": "<p/a>", "o": '"fresh"'}])
    assert stats["triples_inserted"] == 1 and stats["terms_inserted"] == 2
    assert g2.terms.columns == g.terms.columns
    h = term_id('"fresh"')
    row = g2.terms.filter(g2.terms.hash == h).collect()
    assert len(row) == 1 and row[0]["bucket"] == h % TERM_BUCKETS
    out = Engine(g2, local_tier_rows=0).query(
        {"filters": [{"p": "<p/a>", "o": '"fresh"'}], "size": 5}
    )
    assert out["total"] == 1 and "<e/new>" in out["results"]
    # any OTHER schema drift fails loudly instead of silently misaligning
    import pytest as _pytest

    bad = g.terms.withColumnRenamed("bucket", "mystery")
    with _pytest.raises(ValueError, match="mystery"):
        align_terms(bad, g.terms.select("hash", "value", "is_literal"))


def test_engine_mutate_on_bucketed_store_graph(spark, tmp_path):
    """Engine.mutate's driver-buffered delta fold must also align new
    terms to a store-read base's bucketed schema (plans/query.py fold),
    on both the tier and distributed paths."""
    from bikidata_spark import Engine, from_string_quads, read_graph, write_graph

    quads = spark.createDataFrame(
        [(f"<e/{i}>", "<p/a>", f'"v{i}"', "") for i in range(5)],
        "s string, p string, o string, g string",
    )
    write_graph(from_string_quads(quads), str(tmp_path / "g"))
    for tier in (True, False):
        g = read_graph(spark, str(tmp_path / "g"))
        eng = Engine(g) if tier else Engine(g, local_tier_rows=0)
        if tier:
            eng.query({"filters": [{"p": "<p/a>", "o": '"v1"'}], "size": 1})
        assert eng.mutate("insert", [{"s": "<e/m>", "p": "<p/a>", "o": '"minted"'}])[
            "triples_inserted"
        ] == 1
        out = eng.query({"filters": [{"p": "<p/a>", "o": '"minted"'}], "size": 5})
        assert out["total"] == 1 and "<e/m>" in out["results"], f"tier={tier}"
        assert eng.graph.terms.count() >= 12


def test_point_probe_projection_differential(spark, monkeypatch):
    """The s-clustered point-probe projection (_point_probe_triples)
    must be row-identical to the direct corpus scan on every surface it
    backs — page hydration and sp() — across builds, the deferred
    first-sighting path, chained distributed mutations, and the
    buffered-delta overlay. Forced on via the module toggle (auto mode
    only engages over the tier cap, which no test graph reaches)."""
    import bikidata_spark.plans.query as Q

    monkeypatch.setattr(Q, "_POINT_PROBE_FRAME", "1")
    eng = _mk_engine(spark, tier=False)
    ref = _mk_engine(spark, tier=False)
    monkeypatch.setattr(Q, "_POINT_PROBE_FRAME", "0", raising=True)
    # ...but eng reads the module global at call time, so flip per call
    batt = [
        {"filters": [{"p": "<p/type>", "o": "<t/1>"}], "size": 30, "use_cache": False},
        {"filters": [{"p": "<p/desc>", "o": "regex", "regex": "item 1[0-5]"}],
         "size": 10, "use_cache": False},
    ]

    def both(opts):
        monkeypatch.setattr(Q, "_POINT_PROBE_FRAME", "1")
        a = eng.query(dict(opts))
        monkeypatch.setattr(Q, "_POINT_PROBE_FRAME", "0")
        b = ref.query(dict(opts))
        assert a == b, opts
        return a

    for opts in batt:
        both(opts)  # first sighting: deferred build
        both(opts)  # second: builds the projection
    assert eng._hyd_state is not None  # the forced build actually ran
    # chained distributed mutations invalidate the base per step — the
    # projection must defer (never rebuild per mutation) yet stay exact
    for e in (eng, ref):
        assert e.mutate("insert", [{"s": "<m/3>", "p": "<p/projnew>", "o": '"pp"'}])[
            "triples_inserted"
        ] == 1
        assert e.mutate("delete", [{"s": "<m/3>", "p": "<p/peer>"}])["triples_deleted"] == 1
    both({"filters": [{"p": "<p/projnew>", "o": '"pp"'}], "size": 10, "use_cache": False})
    sp_keys = ["<m/3>", "<m/4>", "<m/5>"]
    monkeypatch.setattr(Q, "_POINT_PROBE_FRAME", "1")
    a = eng.sp(sp_keys, "<p/type>")
    monkeypatch.setattr(Q, "_POINT_PROBE_FRAME", "0")
    assert a == ref.sp(sp_keys, "<p/type>")
    # buffered-delta overlay: a tiered engine whose regex queries bail
    # to the distributed path reads base-projection + delta
    tiered = _mk_engine(spark, tier=True)
    tref = _mk_engine(spark, tier=False)
    for e in (tiered, tref):
        assert e.mutate("insert", [{"s": "<m/7>", "p": "<p/desc>", "o": '"item 12 overlay"'}])[
            "triples_inserted"
        ] == 1
    monkeypatch.setattr(Q, "_POINT_PROBE_FRAME", "1")
    ropts = {"filters": [{"p": "<p/desc>", "o": "regex", "regex": "item 1[0-5]"}],
             "size": 20, "use_cache": False}
    ra = tiered.query(dict(ropts))
    ra2 = tiered.query(dict(ropts))  # second pass builds over the base
    monkeypatch.setattr(Q, "_POINT_PROBE_FRAME", "0")
    rb = tref.query(dict(ropts))
    assert ra == rb == ra2


def test_clustered_graph_equals_unclustered(spark):
    """Graph.clustered() is a physical re-layout only: every query
    surface must return identical results, and the clustered triples/
    terms must be the same row bags."""
    from bikidata_spark import Engine, from_string_quads

    quads = spark.createDataFrame(_mk_quads(), "s string, p string, o string, g string")
    plain = from_string_quads(quads).cache()
    clus = from_string_quads(quads).clustered().cache()
    assert sorted(map(tuple, plain.triples.collect())) == sorted(
        map(tuple, clus.triples.collect())
    )
    assert sorted(map(tuple, plain.terms.collect())) == sorted(
        map(tuple, clus.terms.collect())
    )
    a, b = Engine(plain, local_tier_rows=0), Engine(clus, local_tier_rows=0)
    for opts in QUERY_BATTERY:
        o = {**opts, "use_cache": False}
        assert a.query(dict(o)) == b.query(dict(o)), opts


def test_store_s_projection_roundtrip(spark, tmp_path):
    """write_graph(projections=("s",)) writes a second s-clustered sort
    order; read_graph attaches it and the engine's point probes use it
    with a PUSHED s filter (row-group pruning on the cold store).
    Results must equal a projection-less store byte-for-byte, including
    after a mutation (which drops to the delta/fallback path)."""
    from pyspark.sql import functions as F

    from bikidata_spark import Engine, from_string_quads, read_graph, write_graph

    quads = spark.createDataFrame(_mk_quads(), "s string, p string, o string, g string")
    write_graph(from_string_quads(quads), str(tmp_path / "plain"))
    write_graph(
        from_string_quads(quads), str(tmp_path / "proj"), projections=("s",)
    )
    g_plain = read_graph(spark, str(tmp_path / "plain"))
    g_proj = read_graph(spark, str(tmp_path / "proj"))
    assert g_plain.s_projection is None and g_proj.s_projection is not None
    assert sorted(map(tuple, g_proj.s_projection.collect())) == sorted(
        map(tuple, g_proj.triples.collect())
    )
    a = Engine(g_plain, local_tier_rows=0)
    b = Engine(g_proj, local_tier_rows=0)
    # the engine's probe frame IS the projection, and an s probe on it
    # reaches the parquet scan as a pushed filter
    pf = b._point_probe_triples()
    assert pf is g_proj.s_projection  # zero-build: the store frame itself
    some = [r["s"] for r in g_proj.triples.limit(3).collect()]
    plan = pf.filter(F.col("s").isin(some))._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [In(s" in plan, plan
    for opts in QUERY_BATTERY:
        o = {**opts, "use_cache": False}
        assert a.query(dict(o)) == b.query(dict(o)), opts
    # sp() rides the projection too
    assert a.sp(["<m/1>", "<m/2>"], "<p/type>") == b.sp(["<m/1>", "<m/2>"], "<p/type>")
    # mutations produce derived graphs without the projection: results
    # must stay equal through the fallback
    for e in (a, b):
        assert e.mutate("insert", [{"s": "<m/1>", "p": "<p/projd>", "o": '"sv"'}])[
            "triples_inserted"
        ] == 1
    qo = {"filters": [{"p": "<p/projd>", "o": '"sv"'}], "size": 5, "use_cache": False}
    assert a.query(dict(qo)) == b.query(dict(qo))


def test_over_cap_verdict_carries_across_inserts(spark):
    """An over-cap engine must not re-run the tier sizing probe after
    every insert (an insert can only grow the graph); a delete must
    re-probe, since it can shrink the graph under the cap."""
    from bikidata_spark import Engine, from_string_quads

    quads = spark.createDataFrame(_mk_quads(), "s string, p string, o string, g string")
    eng = Engine(from_string_quads(quads).cache(), local_tier_rows=10)
    assert eng._local_tier() is None  # sized: over the (tiny) cap
    gen0 = eng._graph_generation
    assert eng._local_tier_state == (gen0, None)
    assert eng.mutate("insert", [{"s": "<m/oc>", "p": "<p/oc>", "o": '"v"'}])[
        "triples_inserted"
    ] == 1
    # verdict carried to the new generation without a probe
    assert eng._local_tier_state == (eng._graph_generation, None)
    assert eng._graph_generation != gen0
    # a delete invalidates the verdict (the next query re-probes)
    assert eng.mutate("delete", [{"s": "<m/oc>", "p": "<p/oc>", "o": '"v"'}])[
        "triples_deleted"
    ] == 1
    st = eng._local_tier_state
    assert st is None or st[0] != eng._graph_generation
    out = eng.query({"filters": [{"p": "<p/type>", "o": "<t/1>"}], "size": 5})
    assert out["total"] == 30


def test_byte_budget_gates_and_demotes(spark):
    """r10 memory-budgeted tier cap: the sizing probe prices the
    dictionary (count + octet_length aggregation) BEFORE any collect
    and rejects over-budget graphs; a mutation that pushes the resident
    mirror past the budget demotes it (distributed serving continues,
    correct); raising the budget re-promotes after the sticky sizing
    memo is cleared (the refork/operator flow)."""
    from bikidata_spark import Engine, from_string_quads

    quads = spark.createDataFrame(
        [(f"<c/{i}>", "<p>", f'"v{i}"', "") for i in range(50)],
        "s string, p string, o string, g string",
    )
    graph = from_string_quads(quads).cache()
    # budget smaller than even the quad columns: rejected by the probe
    lean = Engine(graph, local_tier_rows=1000, local_tier_bytes=1024)
    assert lean._local_tier() is None

    eng = Engine(graph, local_tier_rows=1000, local_tier_bytes=0)  # rows-only
    tier = eng._local_tier()
    assert tier is not None
    # set the budget just above the resident size, then cross it with
    # one oversized literal: the patched tier must demote
    eng.local_tier_bytes = tier.approx_bytes + 200
    big = '"' + "x" * 4096 + '"'
    assert "error" not in eng.mutate("insert", [{"s": "<c/big>", "p": "<p>", "o": big}])
    assert eng._local_tier() is None  # demoted; verdict sticky this generation
    assert (
        eng.query({"filters": [{"p": "<p>", "o": big}], "use_cache": False})["total"]
        == 1
    )
    # operator raises the budget and clears the memo: re-promotes
    eng.local_tier_bytes = 10 * 1024 * 1024
    eng._local_tier_state = None
    assert eng._local_tier() is not None
    assert (
        eng.query({"filters": [{"p": "<p>", "o": big}], "use_cache": False})["total"]
        == 1
    )


def test_termdict_add_charges_utf8_bytes():
    """r10 judge finding: TermDict.add charged len(value) (code points),
    under-counting multibyte literals against the byte budget. A 4-byte
    emoji must charge 4 blob bytes, not 1."""
    from bikidata_spark.plans.local_tier import TermDict

    import numpy as np

    td = TermDict(
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=np.int64),
        b"",
        np.empty(0, dtype=bool),
    )
    base = td.nbytes
    td.add(1, "\N{GRINNING FACE}", True)  # U+1F600: 1 code point, 4 UTF-8 bytes
    assert td.nbytes - base == 4 + 80
    base = td.nbytes
    td.add(2, "über", False)  # ü as u + combining diaeresis: 5 cp, 6 bytes
    assert td.nbytes - base == 6 + 80
    # re-adding the same hash is free (overlay replace, no growth)
    base = td.nbytes
    td.add(1, "\N{GRINNING FACE}", True)
    assert td.nbytes == base


def test_hop_edges_projection_differential(spark, monkeypatch):
    """The IRI-object hop-edges projection (_hop_edges) must make every
    n-hop walk — plain hops, fts-scored hops (carry), hops after
    mutations touching edge rows — row-identical to the direct corpus
    join. Forced on via the module toggle (auto mode only engages over
    the tier cap, which no test graph reaches)."""
    import bikidata_spark.plans.query as Q

    monkeypatch.setattr(Q, "_HOP_EDGES_FRAME", "1")
    eng = _mk_engine(spark, tier=False)
    ref = _mk_engine(spark, tier=False)
    tiered = _mk_engine(spark, tier=True)
    batt = [
        {"filters": [{"p": "<p/peer> 1", "o": "<m/20>"}], "size": 30},
        {"filters": [{"p": "<p/peer> 2", "o": "<m/20>"}], "size": 30},
        {"filters": [{"p": "fts 1", "o": "alpha"}], "size": 10},  # scored carry
        {"filters": [{"p": "fts 2", "o": "gamma delta"}], "size": 10},
    ]

    def all_three(opts):
        opts = dict(opts, use_cache=False)
        monkeypatch.setattr(Q, "_HOP_EDGES_FRAME", "1")
        a = eng.query(dict(opts))
        monkeypatch.setattr(Q, "_HOP_EDGES_FRAME", "0")
        b = ref.query(dict(opts))
        c = tiered.query(dict(opts))
        assert a == b, opts
        assert a == c, opts

    for opts in batt:
        all_three(opts)  # first sighting: deferred build
        all_three(opts)  # second: builds the projection
    assert eng._hop_edge_state is not None  # the forced build ran
    # mutations: delete an edge row, insert a new one (and a literal-o
    # row that must ride the delta harmlessly), walk again
    for e in (eng, ref, tiered):
        assert e.mutate("delete", [{"s": "<m/21>", "p": "<p/peer>"}])[
            "triples_deleted"
        ] == 1
        assert e.mutate(
            "insert",
            [
                {"s": "<m/21>", "p": "<p/peer>", "o": "<m/20>"},
                {"s": "<m/21>", "p": "<p/hopnote>", "o": '"lit o rides along"'},
            ],
        )["triples_inserted"] == 2
    for opts in batt:
        all_three(opts)


def test_driver_hop_index_differential(spark, monkeypatch):
    """The driver-resident o-sorted edge index (_hop_driver_index) must
    make every walk — plain, multi-hop, scored (carry), empty frontier,
    post-mutation — identical to the distributed join walk and the
    tier. Forced on via the module toggles."""
    import bikidata_spark.plans.query as Q

    monkeypatch.setattr(Q, "_HOP_EDGES_FRAME", "1")
    monkeypatch.setattr(Q, "_DRIVER_HOP", "1")
    eng = _mk_engine(spark, tier=False)
    ref = _mk_engine(spark, tier=False)
    tiered = _mk_engine(spark, tier=True)
    batt = [
        {"filters": [{"p": "<p/peer> 1", "o": "<m/20>"}], "size": 30},
        {"filters": [{"p": "<p/peer> 3", "o": "<m/20>"}], "size": 30},
        {"filters": [{"p": "fts 1", "o": "alpha"}], "size": 10},
        {"filters": [{"p": "fts 2", "o": "gamma delta"}], "size": 10},
        {"filters": [{"p": "<p/peer> 1", "o": "<m/nosuchnode>"}], "size": 10},
    ]

    def all_three(opts):
        opts = dict(opts, use_cache=False)
        monkeypatch.setattr(Q, "_DRIVER_HOP", "1")
        a = eng.query(dict(opts))
        monkeypatch.setattr(Q, "_DRIVER_HOP", "0")
        b = ref.query(dict(opts))
        c = tiered.query(dict(opts))
        assert a == b, opts
        assert a == c, opts

    for opts in batt:
        all_three(opts)
    assert eng._hop_idx_state is not None and eng._hop_idx_state[1] is not None
    # mutation invalidates by base identity: results stay equal after
    for e in (eng, ref, tiered):
        assert e.mutate("insert", [{"s": "<m/21>", "p": "<p/peer>", "o": "<m/20>"}])[
            "triples_inserted"
        ] == 1
    for opts in batt:
        all_three(opts)
    # explosion bail: a row cap of 1 must fall back to the join walk
    monkeypatch.setattr(Q, "_DRIVER_WALK_ROW_MAX", 1)
    all_three(batt[0])


def test_hop_build_in_progress_does_not_block(spark, monkeypatch):
    """r13: the hop-index build no longer holds _cache_lock across its
    Spark collect — a concurrent hop request while a build is in
    flight (simulated via the _hop_idx_building flag) takes the
    distributed walk immediately and returns the correct result;
    clearing the flag lets the index build and serve identically."""
    import bikidata_spark.plans.query as Q

    monkeypatch.setattr(Q, "_DRIVER_HOP", "1")
    eng = _mk_engine(spark, tier=False)
    ref = _mk_engine(spark, tier=False)
    monkeypatch.setattr(Q, "_DRIVER_HOP", "0")
    opts = {"filters": [{"p": "<p/peer> 1", "o": "<m/20>"}], "size": 30,
            "use_cache": False}
    want = ref.query(dict(opts))

    monkeypatch.setattr(Q, "_DRIVER_HOP", "1")
    eng._hop_idx_building = eng.graph  # a build is "in flight"
    assert eng._hop_driver_index() is None  # no queueing behind it
    assert eng.query(dict(opts)) == want    # distributed walk serves
    assert eng._hop_idx_state is None       # and nothing half-built
    eng._hop_idx_building = None
    assert eng._hop_driver_index() is not None  # now builds
    assert eng.query(dict(opts)) == want
    assert "hop_index" in eng._residency_ledger


def test_hop_build_stale_commit_discarded(spark, monkeypatch):
    """r14 (ADVICE): a hop-index build finishing AFTER a newer build
    took over (_hop_idx_building moved off this base) must not clobber
    the newer committed state/ledger — the stale result serves its own
    request and is discarded."""
    import bikidata_spark.plans.query as Q

    monkeypatch.setattr(Q, "_DRIVER_HOP", "1")
    eng = _mk_engine(spark, tier=False)
    DataFrame = type(eng.graph.triples)  # the concrete (classic) class
    sentinel = object()
    orig = DataFrame.toPandas

    def hijack(self):
        # simulate: replace_graph + a newer build raced past this one
        eng._hop_idx_building = sentinel
        return orig(self)

    monkeypatch.setattr(DataFrame, "toPandas", hijack)
    try:
        idx = eng._hop_driver_index()
    finally:
        monkeypatch.setattr(DataFrame, "toPandas", orig)
    assert idx is not None          # this request is still served
    assert eng._hop_idx_state is None  # but the stale result is NOT committed

    eng._hop_idx_building = None
    assert eng._hop_driver_index() is not None  # clean rebuild commits
    assert eng._hop_idx_state is not None
    assert "hop_index" in eng._residency_ledger


def test_properties_memoized_per_generation(spark):
    """r14: properties() memoizes per generation like total() — the
    corpus-wide count_distinct was the slowest steady-state API cell at
    sf10. Second call: zero Spark jobs; a mutation bumps the generation
    and the memo refreshes to include the new property."""
    eng = _mk_engine(spark, tier=False)
    first = {r["val"]: r["count"] for r in eng.properties().collect()}
    assert "<p/type>" in first
    sc = spark.sparkContext
    sc.setJobGroup("props-memo-zero-jobs", "probe")
    try:
        again = {r["val"]: r["count"] for r in eng.properties().collect()}
        jobs = sc.statusTracker().getJobIdsForGroup("props-memo-zero-jobs")
    finally:
        sc.setJobGroup(None, None)
    assert again == first
    assert list(jobs) == []

    r = eng.mutate("insert", [{"s": "<z/1>", "p": "<p/brandnew>", "o": '"x"'}])
    assert "error" not in r
    mutated = {r["val"]: r["count"] for r in eng.properties().collect()}
    assert mutated["<p/brandnew>"] == 1
    assert mutated != first

def test_count_by_property_memoized_per_generation(spark, monkeypatch):
    """r14: count_by_property() memoizes per (generation, prop) on
    tier-less engines — serving repeats the same low-cardinality
    properties verbatim and each call was a corpus-wide count_distinct.
    Repeat: zero Spark jobs; over-cap properties cache a rejection
    marker (no re-probe, still distributed, still correct); a mutation
    bumps the generation and the memo refreshes."""
    from bikidata_spark.plans import query as qmod

    eng = _mk_engine(spark, tier=False)
    first = {r["val"]: r["count"] for r in eng.count_by_property("<p/type>").collect()}
    assert first
    sc = spark.sparkContext
    sc.setJobGroup("cbp-memo-zero-jobs", "probe")
    try:
        again = {r["val"]: r["count"] for r in eng.count_by_property("<p/type>").collect()}
        jobs = sc.statusTracker().getJobIdsForGroup("cbp-memo-zero-jobs")
    finally:
        sc.setJobGroup(None, None)
    assert again == first
    assert list(jobs) == []

    # over-cap: rejection marker, repeats stay distributed and correct
    over = _mk_engine(spark, tier=False)
    monkeypatch.setattr(qmod, "_CBP_MEMO_CAP", 1)
    d1 = {r["val"]: r["count"] for r in over.count_by_property("<p/type>").collect()}
    assert d1 == first
    assert over._cbp_memo[1]["<p/type>"] is None
    d2 = {r["val"]: r["count"] for r in over.count_by_property("<p/type>").collect()}
    assert d2 == first

    r = eng.mutate("insert", [{"s": "<z/9>", "p": "<p/type>", "o": "<t/brandnew>"}])
    assert "error" not in r
    mutated = {r["val"]: r["count"] for r in eng.count_by_property("<p/type>").collect()}
    assert mutated["<t/brandnew>"] == 1
    assert mutated != first

def test_count_by_property_memo_lru_touch(spark, monkeypatch):
    """A memo hit re-inserts the prop (true LRU): with cap 2, touching
    the older entry before inserting a third evicts the untouched one,
    not the least-recently-inserted."""
    from bikidata_spark.plans import query as qmod

    eng = _mk_engine(spark, tier=False)
    monkeypatch.setattr(qmod, "_CBP_MEMO_MAX", 2)
    eng.count_by_property("<p/type>").collect()
    eng.count_by_property("<p/peer>").collect()
    eng.count_by_property("<p/type>").collect()   # LRU touch
    eng.count_by_property("<p/new>").collect()    # evicts <p/peer>, not <p/type>
    assert "<p/type>" in eng._cbp_memo[1]
    assert "<p/peer>" not in eng._cbp_memo[1]
