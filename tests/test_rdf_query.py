"""Engine query-API tests on the sf0.001 RDF-ized corpus.

Mirrors the reference's usage patterns (reference README / examples:
filter dicts with should/must/not, fts, paging, aggregates)."""

from __future__ import annotations


def subjects(engine, opts):
    return {r["s"] for r in engine.subjects_values(opts).collect()}


def test_property_object_filter(engine):
    subs = subjects(engine, {"filters": [{"p": "<p/mktsegment>", "o": '"BUILDING"'}]})
    assert subs and all(s.startswith("<e/customer/") for s in subs)


def test_id_filter(engine):
    assert subjects(engine, {"filters": [{"p": "id", "o": "<e/customer/1>"}]}) == {
        "<e/customer/1>"
    }


def test_must_is_intersection(engine):
    a = subjects(engine, {"filters": [{"p": "<p/mktsegment>", "o": '"BUILDING"'}]})
    b = subjects(engine, {"filters": [{"p": "<p/nation>", "o": "<e/nation/5>"}]})
    both = subjects(
        engine,
        {
            "filters": [
                {"p": "<p/mktsegment>", "o": '"BUILDING"'},
                {"op": "must", "p": "<p/nation>", "o": "<e/nation/5>"},
            ]
        },
    )
    assert both == a & b


def test_not_is_difference(engine):
    allc = subjects(engine, {"filters": [{"p": "<p/type>", "o": "<c/customer>"}]})
    b = subjects(engine, {"filters": [{"p": "<p/mktsegment>", "o": '"BUILDING"'}]})
    diff = subjects(
        engine,
        {
            "filters": [
                {"p": "<p/type>", "o": "<c/customer>"},
                {"op": "not", "p": "<p/mktsegment>", "o": '"BUILDING"'},
            ]
        },
    )
    assert diff == allc - b


def test_fts_conjunctive(engine):
    subs = subjects(engine, {"filters": [{"p": "fts", "o": "customer 000000013"}]})
    assert subs == {"<e/customer/13>"}


def test_fts_hop_travels_up(engine):
    subs = subjects(engine, {"filters": [{"p": "fts 1", "o": "customer 000000013"}]})
    # ancestors of customer 13: its orders (via <p/customer>) point at it
    assert subs and all(s.startswith("<e/orders/") for s in subs)


def test_regex_full_match(engine):
    subs = subjects(engine, {"filters": [{"p": "regex", "o": '"Customer#0000000.."'}]})
    assert len(subs) == 100


def test_paging_deterministic(engine):
    opts = {"filters": [{"p": "<p/type>", "o": "<c/customer>"}], "size": 5, "start": 0}
    p1 = [r["s_value"] for r in engine.page(opts).collect()]
    p2 = [r["s_value"] for r in engine.page(opts).collect()]
    assert p1 == p2 and len(p1) == 5
    nxt = [
        r["s_value"]
        for r in engine.page({**opts, "start": 5}).collect()
    ]
    assert not (set(p1) & set(nxt))


def test_order_by_label_desc(engine):
    opts = {
        "filters": [{"p": "<p/type>", "o": "<c/customer>"}],
        "order": [{"by": "label", "dir": "desc"}],
        "size": 3,
    }
    rows = engine.page(opts).collect()
    labels = [r["s_value"] for r in rows]
    # highest label in the sf0.001 corpus (data is seeded/deterministic)
    assert labels[0] == "<e/customer/149>"


def test_full_query_shape(engine):
    r = engine.query(
        {
            "filters": [{"p": "<p/mktsegment>", "o": '"BUILDING"'}],
            "size": 3,
            "aggregates": ["<p/nation>"],
        }
    )
    assert r["total"] > 3
    assert len(r["results"]) == 3
    ent = next(iter(r["results"].values()))
    assert ent["id"].startswith("<e/customer/")
    assert "<p/nation>" in ent
    assert r["aggregates"]["<p/nation>"]


def test_paths(engine):
    r = engine.query(
        {
            "filters": [{"p": "id", "o": "<e/customer/1>"}],
            "paths": ["<p/parent>"],
            "size": 1,
        }
    )
    ent = r["results"]["<e/customer/1>"]
    chain = ent["_paths"]["<p/parent>"]
    assert len(chain) == 2  # nation, region
    assert chain[0].startswith("<e/nation/") and chain[1].startswith("<e/region/")


def test_sp_and_spo(engine):
    d = engine.sp(["<e/customer/1>"], "<p/mktsegment>")
    assert list(d) == ["<e/customer/1>"]
    rows = engine.spo("<e/customer/1>", None, None).collect()
    assert len(rows) >= 5


def test_total_and_properties(engine):
    assert engine.total() > 100
    props = {r["val"]: r["count"] for r in engine.properties().collect()}
    assert props["<p/type>"] > 100


def test_semantic_filter_returns_self(engine):
    qvec = [float(x) for x in engine.embeddings.filter("s = xxhash64('<e/documents/0>')").first()["vec"]]
    subj, scores = engine._semantic_filter({"vector": qvec}, "", None)
    ids = {r["s"] for r in subj.collect()}
    assert len(ids) >= 1  # at least the identical vector


def test_fts_hop_propagates_scores(engine):
    # reference query.py:204 carries `score` to the ancestor subject
    _, by_score = engine.subjects(
        {"filters": [{"p": "fts 1", "o": "customer 000000013"}], "use_cache": False}
    )
    assert by_score is not None
    rows = by_score.collect()
    assert rows and all(r["score"] > 0 for r in rows)


def test_size_zero_is_aggregates_only(engine):
    # reference examples.ipynb: {"size": 0, "filters": [...], "aggregates": [...]}
    r = engine.query({"size": 0, "filters": [{"p": "<p/type>"}], "aggregates": ["<p/type>"]})
    assert r["results"] == {} and r["size"] == 0
    assert r["total"] > 0 and r["aggregates"]["<p/type>"]
    # malformed size falls back to the default, like the reference's try/except
    r2 = engine.query({"size": "bogus", "filters": [{"p": "id", "o": "<e/nation/5>"}]})
    assert r2["size"] == 999 and len(r2["results"]) == 1


def test_large_page_hydration_uses_join_probe(engine, monkeypatch):
    """A page wider than the IN-list cap hydrates through the broadcast
    join probe; results are identical to the literal-probe path (the
    default size is 999 — an IN-list that big costs ~0.5 s of py4j
    expression building per request)."""
    from bikidata_spark.plans import query as qmod

    opts = {"filters": [{"p": "<p/type>", "o": "<c/nation>"}], "size": 30}
    want = engine.query(opts)
    monkeypatch.setattr(qmod, "_ISIN_PROBE_MAX", 5)
    got = engine.query(opts)
    assert got["results"] == want["results"] and got["total"] == want["total"]


def test_sample_deterministic_no_global_sort(engine):
    # seeded consistent sample: same rows on every run (md5-keyed top-n,
    # partitioning-independent), planned as TakeOrderedAndProject — a
    # per-partition n-heap — never a global Sort
    s1, _ = engine.filter_subjects({"p": "id", "o": "sample 5"})
    s2, _ = engine.filter_subjects({"p": "id", "o": "sample 5"})
    a = sorted(r["s"] for r in s1.collect())
    b = sorted(r["s"] for r in s2.collect())
    assert len(a) == 5 and a == b
    plan = s1._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan  # the global-sort signature
    # different n stays a prefix-compatible sample (consistent keys)
    s3, _ = engine.filter_subjects({"p": "id", "o": "sample 3"})
    assert sorted(r["s"] for r in s3.collect())[0] in a


def test_subject_cache_lru_ttl_eviction(spark):
    """The persisted subject-set cache is bounded: LRU past the cap
    (evicted frames are unpersisted, freeing their blocks) and expired
    past the TTL; hits keep returning the same persisted frame."""
    from bikidata_spark import Engine, build_from_iterator

    g = build_from_iterator(
        spark, [(f"<e/{i}>", "<p/name>", f'"v{i}"') for i in range(8)]
    ).cache()
    eng = Engine(g)
    eng.subject_cache_max = 3
    specs = [{"filters": [{"p": "<p/name>", "o": f'"v{i}"'}]} for i in range(5)]
    frames = [eng.subjects(s)[0] for s in specs]
    assert len(eng._subject_cache) == 3  # capped
    # the two oldest were evicted AND unpersisted
    assert frames[0].storageLevel.useMemory is False
    assert frames[1].storageLevel.useMemory is False
    assert frames[4].storageLevel.useMemory is True
    # hit: same persisted frame object comes back (no recompute)
    again, _ = eng.subjects(specs[4])
    assert again is frames[4]
    # LRU touch: hitting the oldest cached entry protects it from the
    # next eviction
    eng.subjects(specs[2])
    eng.subjects({"filters": [{"p": "<p/name>", "o": '"v6"'}]})
    keys = list(eng._subject_cache)  # JSON keys escape the inner quotes
    assert any("v2" in k for k in keys) and not any("v3" in k for k in keys)
    # TTL: an entry put under an already-elapsed TTL expires on its
    # next read and recomputes (expiry is stamped at put time). The
    # compiled PLAN may be reused (plan cache) — expiry is observable
    # as a result-cache miss, not as a new DataFrame object.
    eng.subject_cache_ttl_s = -1.0
    spec7 = {"filters": [{"p": "<p/name>", "o": '"v7"'}]}
    eng.subjects(spec7)
    misses_before = eng.cache_stats()["misses"]
    eng.subjects(spec7)
    assert eng.cache_stats()["misses"] == misses_before + 1


def test_facet_score_weighted(engine):
    """A scored filter weights facet buckets by summed relevance: the
    weight column exists, orders the output, and the unweighted facet
    is unchanged."""
    subj, scores = engine.subjects({"filters": [{"p": "fts", "o": "customer"}]})
    assert scores is not None
    weighted = engine.facet(subj, "<p/mktsegment>", scores=scores).collect()
    assert [c for c in weighted[0].asDict()] == ["count", "weight", "val"]
    ws = [r["weight"] for r in weighted]
    assert ws == sorted(ws, reverse=True) and all(w > 0 for w in ws)
    plain = engine.facet(subj, "<p/mktsegment>").collect()
    assert [c for c in plain[0].asDict()] == ["count", "val"]
    assert {r["val"] for r in plain} == {r["val"] for r in weighted}
    # counts agree between the two shapes
    assert {(r["count"], r["val"]) for r in plain} == {(r["count"], r["val"]) for r in weighted}


def test_paths_cycle_semantics(spark):
    """Reference parity on cyclic parent chains (reference query.py:
    804-815 grows paths FROM ROOTS, so a cycle — unreachable from any
    root — yields NO path): cycle members produce zero path rows while
    acyclic subjects keep their full chains."""
    from bikidata_spark import Engine, from_string_quads

    quads = [
        # acyclic chain: a -> b -> c (c is a root)
        ("<e/a>", "<p/parent>", "<e/b>", ""),
        ("<e/b>", "<p/parent>", "<e/c>", ""),
        # 2-cycle: x -> y -> x
        ("<e/x>", "<p/parent>", "<e/y>", ""),
        ("<e/y>", "<p/parent>", "<e/x>", ""),
        # type markers so a filter can select all four
        *[(s, "<p/type>", "<c/thing>", "") for s in ("<e/a>", "<e/b>", "<e/c>", "<e/x>", "<e/y>")],
    ]
    g = from_string_quads(
        spark.createDataFrame(quads, "s string, p string, o string, g string")
    )
    eng = Engine(g)
    subs, _ = eng.subjects({"filters": [{"p": "<p/type>", "o": "<c/thing>"}]})
    got = {
        (r["s"], r["pos"], r["ancestor"])
        for r in eng.paths_values({"filters": [{"p": "<p/type>", "o": "<c/thing>"}]}, "<p/parent>").collect()
    }
    assert got == {
        ("<e/a>", 1, "<e/b>"),
        ("<e/a>", 2, "<e/c>"),
        ("<e/b>", 1, "<e/c>"),
    }  # x and y (the cycle) emit nothing; c is a root with no parents


def test_paths_exact_depth_bound_kept(spark):
    """A chain of length exactly MAX_PATH_DEPTH terminates at a root and
    must keep all its rows; a DEEPER acyclic chain is emitted in full
    too (the reference CTE is unbounded — r5 closed the old silent drop
    at the bound), while a cycle deeper than the bound still emits
    nothing."""
    from bikidata_spark import Engine, from_string_quads
    from bikidata_spark.plans.query import MAX_PATH_DEPTH

    n = MAX_PATH_DEPTH
    quads = [(f"<e/{i}>", "<p/parent>", f"<e/{i+1}>", "") for i in range(n)]
    quads += [("<e/0>", "<p/type>", "<c/thing>", "")]
    # a second, deeper chain: d0 -> ... -> d{n+4}
    deep = n + 4
    quads += [(f"<d/{i}>", "<p/parent>", f"<d/{i+1}>", "") for i in range(deep)]
    quads += [("<d/0>", "<p/type>", "<c/thing>", "")]
    # a cycle entered beyond the bound: c0 -> ... -> c{n+1} -> c{n}
    quads += [(f"<c/{i}>", "<p/parent>", f"<c/{i+1}>", "") for i in range(n + 1)]
    quads += [(f"<c/{n+1}>", "<p/parent>", f"<c/{n}>", "")]
    quads += [("<c/0>", "<p/type>", "<c/thing>", "")]
    g = from_string_quads(
        spark.createDataFrame(quads, "s string, p string, o string, g string")
    )
    eng = Engine(g)
    rows = eng.paths_values(
        {"filters": [{"p": "<p/type>", "o": "<c/thing>"}]}, "<p/parent>"
    ).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["s"], []).append((r["pos"], r["ancestor"]))
    # exact-depth chain: full path, ending at the root
    assert sorted(by_src["<e/0>"]) == [(i, f"<e/{i}>") for i in range(1, n + 1)]
    # over-deep acyclic chain: full path (reference parity)
    assert sorted(by_src["<d/0>"]) == [(i, f"<d/{i}>") for i in range(1, deep + 1)]
    # late cycle: never reaches a root -> no rows at all
    assert "<c/0>" not in by_src


def test_paths_local_row_budget_falls_back(spark, monkeypatch):
    """A multi-parent DAG that blows the local walk's row budget hands
    off to the distributed walk mid-request instead of exploding driver
    memory — results identical either way."""
    import bikidata_spark.plans.query as qmod
    from bikidata_spark import Engine, from_string_quads

    # diamond ladder: each level doubles the path count (2^6 = 64 rows
    # for the deepest subject)
    quads = []
    for lv in range(6):
        for side in ("l", "r"):
            quads.append((f"<n/{lv}/{side}>", "<p/parent>", f"<n/{lv+1}/l>", ""))
            quads.append((f"<n/{lv}/{side}>", "<p/parent>", f"<n/{lv+1}/r>", ""))
    quads.append(("<n/0/l>", "<p/type>", "<c/thing>", ""))
    g = from_string_quads(
        spark.createDataFrame(quads, "s string, p string, o string, g string")
    )

    def rows_with(budget):
        monkeypatch.setattr(qmod, "_LOCAL_PATHS_MAX_ROWS", budget)
        eng = Engine(g)
        subj, _ = eng.subjects({"filters": [{"p": "<p/type>", "o": "<c/thing>"}]})
        return sorted(
            (r["src"], r["pos"], r["ancestor"])
            for r in eng.paths(subj, "<p/parent>").collect()
        )

    full = rows_with(10**7)  # local walk completes
    tiny = rows_with(10)  # budget blown → distributed walk
    assert full == tiny and len(full) > 60


def test_order_key_index_invalidated_on_graph_swap(spark):
    """The persisted order-key sort index is generation-keyed: after
    replace_graph, ordered pages must reflect the NEW labels, not the
    stale index."""
    from bikidata_spark import Engine, build_from_iterator

    label = "<http://www.w3.org/2000/01/rdf-schema#label>"

    def graph(labels):
        return build_from_iterator(
            spark,
            [(f"<e/{i}>", label, f'"{v}"') for i, v in enumerate(labels)]
            + [(f"<e/{i}>", "<p/type>", "<c/thing>") for i in range(len(labels))],
        )

    opts = {
        "filters": [{"p": "<p/type>", "o": "<c/thing>"}],
        "order": [{"by": "label"}],
        "size": 3,
        "use_cache": False,
    }
    eng = Engine(graph(["bb", "aa", "cc"]))
    first = [r["s_value"] for r in eng.page(opts).collect()]
    assert first == ["<e/1>", "<e/0>", "<e/2>"]  # aa, bb, cc
    eng.replace_graph(graph(["zz", "mm", "aa"]))
    second = [r["s_value"] for r in eng.page(opts).collect()]
    assert second == ["<e/2>", "<e/1>", "<e/0>"]  # aa, mm, zz


def test_fast_page_matches_distributed_page(spark, monkeypatch):
    """r6: query()'s driver-side fast page (collect + Python sort)
    must return EXACTLY the distributed page — including non-ASCII
    subjects (Python code-point order vs Spark UTF8 binary order) and
    paging slices — and the over-cap fallback must agree too."""
    import bikidata_spark.plans.query as qmod
    from bikidata_spark import Engine, from_string_quads

    # subjects with multibyte and mixed-script IRIs to stress ordering
    names = [
        "<e/zürich>", "<e/Ωmega>", "<e/alpha>", "<e/Alpha>", "<e/中文>",
        "<e/ábc>", "<e/zz>", "<e/a-b>", "<e/a_b>", "<e/émile>", "<e/9num>",
    ]
    quads = [(s, "<p/type>", "<c/thing>", "") for s in names]
    g = from_string_quads(
        spark.createDataFrame(quads, "s string, p string, o string, g string")
    )
    opts = {
        "filters": [{"p": "<p/type>", "o": "<c/thing>"}],
        "size": 4,
        "start": 3,
        "use_cache": False,
    }

    def page_ids(cap):
        monkeypatch.setattr(qmod, "_FAST_PAGE_ROWS", cap)
        eng = Engine(g)
        out = eng.query(opts)
        return list(out["results"]), out["total"]

    fast_ids, fast_total = page_ids(20000)
    slow_ids, slow_total = page_ids(0)  # force the distributed page
    assert fast_total == slow_total == len(names)
    # results-dict insertion order is hydration-collect order (not the
    # page order) in BOTH paths — compare membership: a 4-of-11 slice
    # at start=3 pins the sort order through what it selects
    assert sorted(fast_ids) == sorted(slow_ids)
    assert len(fast_ids) == 4


def test_paths_local_walk_matches_distributed(spark, monkeypatch):
    """r6: dimension-sized hierarchies walk driver-side. The Python
    walk must produce EXACTLY the distributed walk's rows — including
    multiplicity through diamonds, cycle drops, multi-parent fan-out,
    and deep chains — pinned by running both on the same graphs."""
    import bikidata_spark.plans.query as qmod
    from bikidata_spark import Engine, from_string_quads
    from bikidata_spark.plans.query import MAX_PATH_DEPTH

    n = MAX_PATH_DEPTH
    quads = [
        # diamond: m -> {p1, p2} -> gp  (each path multiplies rows)
        ("<e/m>", "<p/parent>", "<e/p1>", ""),
        ("<e/m>", "<p/parent>", "<e/p2>", ""),
        ("<e/p1>", "<p/parent>", "<e/gp>", ""),
        ("<e/p2>", "<p/parent>", "<e/gp>", ""),
        # plain chain + 2-cycle
        ("<e/a>", "<p/parent>", "<e/b>", ""),
        ("<e/b>", "<p/parent>", "<e/c>", ""),
        ("<e/x>", "<p/parent>", "<e/y>", ""),
        ("<e/y>", "<p/parent>", "<e/x>", ""),
    ]
    # a chain deeper than the bound
    quads += [(f"<d/{i}>", "<p/parent>", f"<d/{i+1}>", "") for i in range(n + 4)]
    subjects = ["<e/m>", "<e/a>", "<e/x>", "<d/0>", "<e/gp>"]
    quads += [(s, "<p/type>", "<c/thing>", "") for s in subjects]
    g = from_string_quads(
        spark.createDataFrame(quads, "s string, p string, o string, g string")
    )

    def rows_with(local: bool):
        if local:
            monkeypatch.setattr(qmod, "_LOCAL_PATHS_EDGES", 200000)
        else:
            monkeypatch.setattr(qmod, "_LOCAL_PATHS_EDGES", 0)  # force distributed
        eng = Engine(g)
        subj, _ = eng.subjects({"filters": [{"p": "<p/type>", "o": "<c/thing>"}]})
        out = eng.paths(subj, "<p/parent>").collect()
        return sorted((r["src"], r["pos"], r["ancestor"]) for r in out)

    dist = rows_with(local=False)
    loc = rows_with(local=True)
    assert loc == dist
    assert len(dist) > 0
    # the diamond really produced multiplicity-2 grandparent rows
    from collections import Counter

    counts = Counter(dist)
    assert max(counts.values()) == 2


def test_subject_cache_generation_guard(spark):
    """A subject set computed against a graph that was swapped out
    mid-flight must NOT be cached (it would serve pre-mutation results
    for up to the TTL)."""
    from bikidata_spark import Engine, from_string_quads

    quads = spark.createDataFrame(
        [("<e/1>", "<p>", '"v"', "")], "s string, p string, o string, g string"
    )
    g = from_string_quads(quads)
    eng = Engine(g)
    stale_gen = eng._graph_generation
    result = eng._subjects_uncached({"filters": [{"p": "<p>", "o": ""}]})
    result = (result[0].persist(), result[1])
    eng.replace_graph(from_string_quads(quads))  # mutation lands first
    eng._cache_put("k", result, stale_gen)
    assert eng.cache_stats()["entries"] == 0  # stale insert dropped
    # a current-generation insert still caches
    eng._cache_put("k", result, eng._graph_generation)
    assert eng.cache_stats()["entries"] == 1


def test_cluster_shaped_plans(spark, tmp_path, monkeypatch):
    """The cluster-shaped audit (r4 #2): with size-based broadcasts OFF
    (autoBroadcastJoinThreshold=-1) and the engine serving from a
    PERSISTED graph+FTS store, representative gate queries must (a)
    introduce no cartesian / nested-loop joins beyond the designed
    one-row centroid folds, (b) reach the parquet store with
    PushedFilters, and (c) partition-prune the FTS token buckets.
    Mirrors `tools/planaudit.py --cluster` (full 77-query sweep writes
    docs/PLAN_AUDIT_CLUSTER.json)."""
    import importlib.util
    import os
    from pathlib import Path

    SF_DIR = os.environ.get("BIKIDATA_TEST_SF_DIR", "/root/testdata/sf0.001")

    spec = importlib.util.spec_from_file_location(
        "entry_cluster", str(Path(__file__).resolve().parent.parent / "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from tools.planaudit import audit_plan

    monkeypatch.setenv("SPARK_GRAFT_GRAPH_STORE", str(tmp_path / "store"))
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        qs = mod.queries()
        picks = [
            "rdf_filter_must",
            "rdf_fts",
            "rdf_paths",
            "rdf_facet_nation",
            "rdf_semantic_ivf",
            "pipe_dedup_minhash",
            "pipe_events_asof",
        ]
        recs = {}
        for name in picks:
            df = qs[name](spark, SF_DIR)
            recs[name] = audit_plan(df._jdf.queryExecution().executedPlan().toString())
        # centroid folds are the ONLY tolerated nested loops
        nlj_ok = {"rdf_semantic_ivf"}
        for name, r in recs.items():
            assert r["cartesian"] == 0, (name, r)
            assert r["nested_loop_join"] == 0 or name in nlj_ok, (name, r)
        # persisted-store scans push their filters down
        for name in ("rdf_filter_must", "rdf_fts", "rdf_paths", "rdf_facet_nation"):
            assert recs[name]["pushed_filters"], (name, recs[name])
        # FTS buckets and IVF cells partition-prune. The fts point path
        # collects its probe driver-side (term-at-a-time), so the
        # bucket pruning lives in the recorded PROBE plan, not the
        # returned subject plan
        fts_eng = mod._engine(spark, SF_DIR)
        probe_frames = getattr(fts_eng, "_fts_probe_frames", [])
        assert probe_frames, "fts driver path recorded no probe frame"
        probe_rec = audit_plan(
            probe_frames[-1]._jdf.queryExecution().executedPlan().toString()
        )
        assert probe_rec["partition_filters"], probe_rec
        assert recs["rdf_semantic_ivf"]["partition_filters"]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)


def test_fused_facets_match_per_facet(engine):
    """query()'s single fused facet job must equal the per-facet facet()
    API across all three facet kinds (property facet, properties,
    graphs) on the same filtered subject set."""
    opts = {
        "size": 0,
        "filters": [{"p": "<p/type>", "o": "<c/customer>"}],
        "aggregates": ["<p/mktsegment>", "<p/nation>", "properties", "graphs"],
    }
    r = engine.query(opts)
    s_results, _ = engine.subjects({"filters": opts["filters"]})
    for agg in opts["aggregates"]:
        rows = engine.facet(s_results, agg).collect()
        expect = [(x["count"], x["val"]) for x in rows]
        expect.sort(key=lambda cv: (-cv[0], cv[1]))
        assert r["aggregates"][agg] == expect, agg


def test_fused_facets_single_job(engine):
    """k facets cost ONE job (plus any broadcast-exchange jobs), not k:
    the fused tagged aggregation is the point of _facets_fused. Pins
    the DISTRIBUTED plan shape, so the local tier (which serves this
    query with zero jobs outright) is disabled."""
    from bikidata_spark import Engine

    engine = Engine(engine.graph, local_tier_rows=0)
    sc = engine.graph.spark.sparkContext
    tracker = sc.statusTracker()
    opts = {
        "size": 0,
        "filters": [{"p": "<p/type>", "o": "<c/customer>"}],
    }
    engine.query(opts)  # warm caches: subject set, persisted frames
    before = len(tracker.getJobIdsForGroup(None) or []) or len(
        tracker.getActiveJobsIds() or []
    )
    sc.setJobGroup("fused-facets-probe", "facet job count probe")
    try:
        engine.query(
            dict(opts, aggregates=["<p/mktsegment>", "<p/nation>", "properties"])
        )
    finally:
        sc.setJobGroup(None, None)
    jobs = tracker.getJobIdsForGroup("fused-facets-probe")
    # subject set is cached; remaining jobs: fast-page collect + ONE
    # fused facet collect + bounded broadcast-exchange side jobs. The
    # pre-fusion shape paid one collect PER facet — with 3 facets the
    # bound below would be violated.
    assert jobs, "probe job group recorded no jobs — tracker misused"
    assert len(jobs) <= 5, jobs


def test_total_memo_invalidates_on_replace_graph(spark, engine):
    """total() memoizes per graph generation — a graph swap must drop
    the memo, and mutation flows all route through replace_graph."""
    from bikidata_spark import Engine
    from bikidata_spark.graph import from_string_quads

    quads = spark.createDataFrame(
        [("<s/1>", "<p/a>", "<o/1>", ""), ("<s/2>", "<p/a>", "<o/2>", "")],
        "s string, p string, o string, g string",
    )
    eng = Engine(from_string_quads(quads))
    assert eng.total() == 2
    assert eng.total() == 2  # memo hit
    bigger = spark.createDataFrame(
        [("<s/%d>" % i, "<p/a>", "<o/1>", "") for i in range(5)],
        "s string, p string, o string, g string",
    )
    eng.replace_graph(from_string_quads(bigger))
    assert eng.total() == 5


def test_fts_term_dfs_warm_queries_schedule_no_df_jobs(engine):
    """Repeated serving vocabulary must not re-probe token_df: after the
    first query warms the df LRU, term_dfs is job-free."""
    idx = engine.fts
    sc = engine.graph.spark.sparkContext
    idx.term_dfs("customer 000000013")  # warm (probe + heavy memo)
    tracker = sc.statusTracker()
    sc.setJobGroup("dfs-warm-probe", "x")
    try:
        dfs = idx.term_dfs("customer 000000013")
    finally:
        sc.setJobGroup(None, None)
    assert dfs["customer"] > 0 and dfs["000000013"] >= 1
    assert not (tracker.getJobIdsForGroup("dfs-warm-probe") or [])


def test_facet_cardinality_cap(engine):
    """Facets return the top-N buckets by (count desc, val asc) —
    default N = FACET_MAX_VALUES, per-request override via
    ``aggregates_limit``, 0 = the reference's unbounded behavior. The
    cap must hold identically on the tier, the distributed fused path
    (bounded per-tag window — the collect is capped BEFORE the driver),
    and the facet() API (TakeOrderedAndProject)."""
    from bikidata_spark import Engine
    from bikidata_spark.plans.query import FACET_MAX_VALUES

    opts = {
        "size": 0,
        "filters": [{"p": "<p/type>", "o": "<c/customer>"}],
        "aggregates": ["<p/nation>"],
    }
    full = engine.query(dict(opts, aggregates_limit=0))["aggregates"]["<p/nation>"]
    assert len(full) > 3  # the cap below actually bites
    capped = engine.query(dict(opts, aggregates_limit=3))["aggregates"]["<p/nation>"]
    assert capped == full[:3]
    dflt = engine.query(opts)["aggregates"]["<p/nation>"]
    assert dflt == full[:FACET_MAX_VALUES]

    s_results, _ = engine.subjects({"filters": opts["filters"]})
    rows = engine.facet(s_results, "<p/nation>", limit=3).collect()
    assert [(r["count"], r["val"]) for r in rows] == full[:3]

    # corpus-scale shape: known_rows=None skips the small/broadcast
    # scope, so the bounded row_number window must cap each tag
    fused, truncated = engine._facets_fused(
        s_results, ["<p/nation>", "properties"], known_rows=None, limit=3
    )
    assert fused["<p/nation>"] == full[:3]
    assert len(fused["properties"]) == 3
    assert "<p/nation>" in truncated  # the cap bit travels with the cap

    # truncation marker on the response: present exactly when the cap
    # bites, absent on complete facets (tier and distributed identically)
    capped_resp = engine.query(dict(opts, aggregates_limit=3))
    assert capped_resp["aggregates_truncated"] == ["<p/nation>"]
    assert "aggregates_truncated" not in engine.query(dict(opts, aggregates_limit=0))

    # distributed path (tier off) pins the same contract byte-for-byte
    dist = Engine(engine.graph, local_tier_rows=0)
    d3 = dist.query(dict(opts, aggregates_limit=3))
    assert d3["aggregates"]["<p/nation>"] == full[:3]
    assert d3["aggregates_truncated"] == ["<p/nation>"]
    d0 = dist.query(dict(opts, aggregates_limit=0))
    assert d0["aggregates"]["<p/nation>"] == full
    assert "aggregates_truncated" not in d0
