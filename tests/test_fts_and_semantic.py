"""Tests: FTS index internals, entity text aggregation, semantic index
build, raw SQL passthrough."""

from __future__ import annotations

from pyspark.sql import functions as F

from bikidata_spark import Engine, from_string_quads
from bikidata_spark.functions.embed import build_semantic, fake_embedding
from bikidata_spark.operators.fts import build_fts_index, entity_text, tokenize_query


def _mini_graph(spark):
    quads = spark.createDataFrame(
        [
            ("<e/1>", "<label>", '"alpha beta"', ""),
            ("<e/1>", "<p/child>", "<e/2>", ""),
            ("<e/2>", "<label>", '"gamma"', ""),
            ("<e/3>", "<label>", '"alpha alpha"', ""),
        ],
        "s string, p string, o string, g string",
    )
    return from_string_quads(quads)


def test_tokenize_query():
    assert tokenize_query("Hello, World-42!") == ["hello", "world", "42"]


def test_bm25_ranks_higher_tf(spark):
    g = _mini_graph(spark)
    idx = build_fts_index(g.literals())
    hits = {r["lit"]: r["score"] for r in idx.match("alpha").collect()}
    assert len(hits) == 2
    lit_map = {r["value"]: r["hash"] for r in g.literals().collect()}
    # doc with tf=2 scores higher than tf=1
    assert hits[lit_map['"alpha alpha"']] > hits[lit_map['"alpha beta"']]


def test_conjunctive_requires_same_literal(spark):
    g = _mini_graph(spark)
    idx = build_fts_index(g.literals())
    assert idx.match("alpha gamma").count() == 0  # terms in different literals
    assert idx.match("alpha beta").count() == 1


def test_entity_text_includes_child_literals(spark):
    g = _mini_graph(spark)
    et = {r["s"]: r["text"] for r in entity_text(g, hops=2).collect()}
    e1 = g.terms.filter(F.col("value") == "<e/1>").first()["hash"]
    assert '"alpha beta"' in et[e1] and '"gamma"' in et[e1]  # own + child


def test_build_semantic_deterministic(spark):
    g = _mini_graph(spark)
    emb = build_semantic(g, dim=16)
    rows = {r["s"]: r["vec"] for r in emb.collect()}
    assert all(len(v) == 16 for v in rows.values())
    rows2 = {r["s"]: r["vec"] for r in build_semantic(g, dim=16).collect()}
    assert rows == rows2


def test_fake_embedding_unit_norm():
    v = fake_embedding("hello", 32)
    assert abs(sum(x * x for x in v) - 1.0) < 1e-9
    assert v == fake_embedding("hello", 32)
    assert v != fake_embedding("other", 32)


def test_raw_sql_passthrough(spark):
    g = _mini_graph(spark)
    eng = Engine(g)
    n = eng.raw("SELECT COUNT(*) AS n FROM triples").first()["n"]
    assert n == 4


def test_raw_two_engines_one_session(spark):
    """Two Engines over different graphs on ONE SparkSession: each
    raw() call must see ITS OWN graph even when the other engine
    registered the shared temp views in between (the ownership is
    tracked per session by graph identity, not per-engine
    generation)."""
    from bikidata_spark import Engine, build_from_iterator

    a = Engine(build_from_iterator(spark, [(f"<a/{i}>", "<p>", '"v"') for i in range(3)]))
    b = Engine(build_from_iterator(spark, [(f"<b/{i}>", "<p>", '"v"') for i in range(5)]))
    for _ in range(2):
        assert a.raw("SELECT COUNT(*) AS n FROM triples").first()["n"] == 3
        assert b.raw("SELECT COUNT(*) AS n FROM triples").first()["n"] == 5


def test_no_aqe_scopes_overlap_across_engines(spark):
    """Overlapping _no_aqe scopes from two Engines on one session must
    restore the ORIGINAL conf value — per-engine saved state would
    leave AQE off for the whole session."""
    from bikidata_spark import Engine, build_from_iterator

    a = Engine(build_from_iterator(spark, [("<a>", "<p>", '"v"')]))
    b = Engine(build_from_iterator(spark, [("<b>", "<p>", '"v"')]))
    key = "spark.sql.adaptive.enabled"
    orig = spark.conf.get(key)
    with a._no_aqe():
        assert spark.conf.get(key) == "false"
        with b._no_aqe():
            assert spark.conf.get(key) == "false"
        assert spark.conf.get(key) == "false"  # a's scope still open
    assert spark.conf.get(key) == orig


def test_non_json_filter_value_skips_caches(spark):
    """Filter payloads that are not JSON-serializable (e.g. a numpy
    query vector) must run — both caches are skipped rather than
    crashing on the key computation or colliding on a lossy key."""
    import numpy as np
    from pyspark.sql import functions as F

    g = _mini_graph(spark)
    emb = g.triples.select("s").distinct().select(
        "s", F.array(F.lit(1.0), F.lit(0.0)).alias("vec")
    )
    eng = Engine(g, embeddings=emb)
    vec = np.array([1.0, 0.0], dtype=np.float32)
    for flag in (True, False):
        out = eng.query(
            {"filters": [{"p": "semantic", "vector": vec}], "size": 5, "use_cache": flag}
        )
        assert out["total"] > 0  # matches, and no key-computation crash
    assert eng.cache_stats()["entries"] == 0  # uncacheable spec never cached


def test_raw_under_graph_swap_stress(spark):
    """raw() registers its temp views once per graph generation under
    the cache lock, so concurrent raw() calls racing a replace_graph
    never interleave view registrations across different graphs: every
    observed count is a count some single generation actually had."""
    import threading

    from bikidata_spark import build_from_iterator

    def graph_n(n):
        return build_from_iterator(
            spark, [(f"<e/{i}>", "<p/x>", f'"v{i}"') for i in range(n)]
        )

    eng = Engine(graph_n(3))
    valid = {3, 4, 5, 6, 7}
    errors = []
    stop = threading.Event()

    def reader():
        try:
            while not stop.is_set():
                n = eng.raw("SELECT COUNT(*) AS n FROM triples").first()["n"]
                assert n in valid, n
        except Exception as e:  # surfaced to the main thread below
            errors.append(e)

    threads = [threading.Thread(target=reader) for _ in range(4)]
    for t in threads:
        t.start()
    for n in (4, 5, 6, 7):
        eng.replace_graph(graph_n(n))
    stop.set()
    for t in threads:
        t.join(30)
    assert not errors, errors
    assert eng.raw("SELECT COUNT(*) AS n FROM triples").first()["n"] == 7


def test_persisted_index_matches_inmemory(spark, tmp_path):
    from bikidata_spark.operators.fts import read_fts_index, write_fts_index

    g = _mini_graph(spark)
    idx = build_fts_index(g.literals())
    write_fts_index(idx, str(tmp_path / "fts"), num_buckets=8)
    persisted = read_fts_index(spark, str(tmp_path / "fts"))
    for q in ("alpha", "alpha beta", "gamma", "nosuchtoken"):
        a = sorted((r["lit"], round(r["score"], 9)) for r in idx.match(q).collect())
        b = sorted((r["lit"], round(r["score"], 9)) for r in persisted.match(q).collect())
        assert a == b, q
    # the scan must be partition-pruned to the query's token buckets
    import re

    plan = persisted.match("alpha")._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*bucket", plan), plan
    # norms-in-postings store layout: dl persists WITH the postings, so
    # the re-opened store scores without a corpus doc_len join — exactly
    # one scan (the postings) feeds the match plan besides token_df
    assert "dl" in persisted.postings.columns
    assert plan.count("Scan parquet") == 2, plan


def test_persisted_index_normalized_back_compat(spark, tmp_path):
    """A store written before norms-in-postings (no dl column) still
    matches via the doc_len join fallback."""
    from bikidata_spark.operators.fts import read_fts_index, write_fts_index

    g = _mini_graph(spark)
    idx = build_fts_index(g.literals())
    path = str(tmp_path / "fts_old")
    write_fts_index(idx, path, num_buckets=8)
    # strip dl out of the persisted postings, emulating the old layout
    stripped = spark.read.parquet(f"{path}/postings").drop("dl")
    stripped.write.mode("overwrite").parquet(f"{path}/postings_tmp")
    import shutil

    shutil.rmtree(f"{path}/postings")
    shutil.move(f"{path}/postings_tmp", f"{path}/postings")
    old = read_fts_index(spark, path)
    assert "dl" not in old.postings.columns
    a = sorted((r["lit"], round(r["score"], 9)) for r in idx.match("alpha beta").collect())
    b = sorted((r["lit"], round(r["score"], 9)) for r in old.match("alpha beta").collect())
    assert a == b


def test_stemmed_index_matches_plural_queries(spark):
    from bikidata_spark.functions.porter import porter_stem

    g = _mini_graph(spark)
    idx = build_fts_index(g.literals(), stem=True)
    # "alphas" stems to "alpha" and matches both alpha literals
    assert idx.match("alphas").count() == 2
    # plain index: no match for the plural form
    assert build_fts_index(g.literals()).match("alphas").count() == 0
    # full porter now: inflected forms far beyond step 1a all hit
    assert [porter_stem(t) for t in ("ponies", "glasses", "grass", "cats", "s")] == [
        "poni", "glass", "grass", "cat", "s",
    ]
    assert [porter_stem(t) for t in ("motoring", "agreed", "relational", "hopefulness")] == [
        "motor", "agre", "relat", "hope",
    ]


def test_accented_query_matches_plain_index(spark):
    g = _mini_graph(spark)
    idx = build_fts_index(g.literals())
    # query-side accents are stripped to match the unaccented corpus
    plain = idx.match("alpha").count()
    assert plain > 0 and idx.match("älphä").count() == plain


def test_fts_settings_env_override(spark, monkeypatch):
    """BIKIDATA_FTS_SETTINGS parity (reference main.py:207-216): the
    engine's lazily-built index honors the JSON override."""
    from bikidata_spark import Engine

    g = _mini_graph(spark)
    monkeypatch.setenv("BIKIDATA_FTS_SETTINGS", '{"stemmer": "porter"}')
    eng = Engine(g)
    assert eng.fts.stem and eng.fts.strip
    assert eng.fts.match("alphas").count() == 2  # stemmed index matches plural
    monkeypatch.setenv("BIKIDATA_FTS_SETTINGS", "not json")
    eng2 = Engine(g)
    assert not eng2.fts.stem  # malformed override falls back to defaults


def test_batched_provider_batching_retry_pacing():
    from bikidata_spark.functions.embed import BatchedProvider

    calls, sleeps = [], []
    fails = {"n": 2}

    def flaky(chunk):
        if fails["n"]:
            fails["n"] -= 1
            raise ConnectionError("transient")
        calls.append(len(chunk))
        return [[float(len(t))] for t in chunk]

    t = {"now": 0.0}
    p = BatchedProvider(
        flaky, batch_size=4, max_retries=3, backoff_s=0.5,
        min_interval_s=1.0, sleep=sleeps.append, clock=lambda: t["now"],
    )
    out = p.embed_many([f"t{i}" for i in range(10)])
    assert len(out) == 10 and calls == [4, 4, 2]  # 96-style batching (here 4)
    assert sleeps[:2] == [0.5, 1.0]  # exponential backoff on the 2 failures
    assert any(s == 1.0 for s in sleeps[2:])  # rate-limit pacing between calls

    def always_down(chunk):
        raise ConnectionError("down")

    import pytest as _pytest

    p2 = BatchedProvider(always_down, max_retries=2, sleep=lambda s: None)
    with _pytest.raises(ConnectionError):
        p2.embed_many(["x"])

    def wrong_arity(chunk):
        return [[1.0]] * (len(chunk) + 1)

    p3 = BatchedProvider(wrong_arity, max_retries=0, sleep=lambda s: None)
    with _pytest.raises(ValueError):
        p3.embed_many(["x"])


def test_http_embedding_client_against_local_server():
    """Real HTTP round trip: an in-process localhost server speaking
    the Cohere-v2-style contract (reference semantic.py:28-38) proves
    the stdlib transport end-to-end — request shape, auth header,
    batching via BatchedProvider, retry on 500, dim validation."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from bikidata_spark.functions.embed import BatchedProvider, HttpEmbeddingClient

    seen = {"bodies": [], "auth": [], "fail_next": 1}

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = _json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            seen["bodies"].append(body)
            seen["auth"].append(self.headers.get("Authorization"))
            if seen["fail_next"]:
                seen["fail_next"] -= 1
                self.send_response(500)
                self.end_headers()
                return
            dim = body["output_dimension"]
            vecs = [[float(len(t))] * dim for t in body["texts"]]
            reply = _json.dumps({"embeddings": {"float": vecs}}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(reply)))
            self.end_headers()
            self.wfile.write(reply)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}/v2/embed"
        client = HttpEmbeddingClient(url, api_key="k", dim=4)
        provider = BatchedProvider(client, batch_size=2, backoff_s=0, sleep=lambda s: None)
        out = provider.embed_many(["a", "bb", "ccc"])
        assert out == [[1.0] * 4, [2.0] * 4, [3.0] * 4]
        # the 500 consumed one request; retry made it 3 successful + 1 failed
        assert len(seen["bodies"]) == 3 and seen["auth"][0] == "Bearer k"
        ok = [b for b in seen["bodies"]]
        assert ok[0]["model"] == "embed-v4.0" and ok[0]["input_type"] == "search_document"
        assert [len(b["texts"]) for b in ok] == [2, 2, 1]  # 96-style batching (here 2)

    finally:
        srv.shutdown()
        srv.server_close()


def test_http_embedding_client_response_paths():
    """OpenAI-style replies ({'data': [{'embedding': [...]}]}) decode
    via response_path without a live server (opener injected)."""
    import io
    import json as _json

    from bikidata_spark.functions.embed import HttpEmbeddingClient

    class FakeResp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def opener(req, timeout):
        body = _json.loads(req.data)
        vecs = [{"embedding": [float(len(t)), 0.0]} for t in body["texts"]]
        return FakeResp(_json.dumps({"data": vecs}).encode())

    c = HttpEmbeddingClient("http://x/v1/embeddings", dim=2, response_path=("data",), opener=opener)
    assert c(["ab", "c"]) == [[2.0, 0.0], [1.0, 0.0]]

    import pytest as _pytest

    c_bad = HttpEmbeddingClient("http://x", dim=3, response_path=("data",), opener=opener)
    with _pytest.raises(ValueError):  # endpoint dim != declared dim
        c_bad(["ab"])


def test_build_semantic_with_provider(spark):
    from bikidata_spark.functions.embed import BatchedProvider, build_semantic, fake_embedding

    g = _mini_graph(spark)
    provider = BatchedProvider(lambda chunk: [fake_embedding(t, 16) for t in chunk])
    via_provider = {tuple(r["vec"]) for r in build_semantic(g, dim=16, provider=provider).collect()}
    direct = {tuple(r["vec"]) for r in build_semantic(g, dim=16).collect()}
    assert via_provider == direct  # same vectors through the batched seam


def test_conjunctive_tolerates_duplicate_query_terms(spark):
    """Stemming can collapse distinct query words into one term; the
    conjunctive threshold must count DISTINCT terms or such queries can
    never match ('customers customer' → ['custom','custom'])."""
    quads = spark.createDataFrame(
        [("<e/1>", "<label>", '"the customers arrived"', "")],
        "s string, p string, o string, g string",
    )
    g = from_string_quads(quads)
    idx = build_fts_index(g.literals(), stem=True)
    assert idx.match("customers customer").count() == 1
    # unstemmed duplicate words behave the same way
    idx2 = build_fts_index(g.literals())
    assert idx2.match("customers customers").count() == 1


def test_read_fts_index_back_compat_defaults(spark, tmp_path):
    """A pre-accent-stripping stats row (no 'strip' column) must default
    strip=False — the persisted tokens were never stripped. A stem=True
    store without a stemmer version is refused (incompatible stemmer)."""
    import pytest as _pytest

    from bikidata_spark.operators.fts import read_fts_index, write_fts_index

    g = _mini_graph(spark)
    idx = build_fts_index(g.literals())
    path = str(tmp_path / "legacy_idx")
    write_fts_index(idx, path, num_buckets=4)
    # rewrite stats in the legacy shape: no strip, no stemver
    legacy = spark.createDataFrame(
        [(idx.n_docs, float(idx.avgdl), 4, False)],
        "n_docs long, avgdl double, num_buckets int, stem boolean",
    )
    legacy.coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")
    loaded = read_fts_index(spark, path)
    assert loaded.strip is False and loaded.stem is False
    # legacy stem=True: refuse instead of silently mis-stemming queries
    legacy_stem = spark.createDataFrame(
        [(idx.n_docs, float(idx.avgdl), 4, True)],
        "n_docs long, avgdl double, num_buckets int, stem boolean",
    )
    legacy_stem.coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")
    with _pytest.raises(ValueError, match="stemmer"):
        read_fts_index(spark, path)
    # current writer round-trips cleanly
    path2 = str(tmp_path / "cur_idx")
    write_fts_index(build_fts_index(g.literals(), stem=True, strip_accents=True), path2)
    cur = read_fts_index(spark, path2)
    assert cur.stem is True and cur.strip is True


def test_fts_settings_env_coercion(monkeypatch):
    from bikidata_spark.operators.fts import fts_settings_from_env

    cases = [
        ('{"strip_accents": "false", "stemmer": null}', 0, ""),
        ('{"strip_accents": null}', 0, None),
        ('{"strip_accents": "1", "stemmer": "PORTER"}', 1, "porter"),
        ('{"strip_accents": true}', 1, None),
        ('{"strip_accents": "off"}', 0, None),
    ]
    for raw, strip, stemmer in cases:
        monkeypatch.setenv("BIKIDATA_FTS_SETTINGS", raw)
        s = fts_settings_from_env()
        assert s.get("strip_accents") == strip, raw
        if stemmer is not None:
            assert s.get("stemmer") == stemmer, raw
        # the Engine.fts consumption pattern must not raise
        assert isinstance(bool(s.get("strip_accents", 1)), bool)
    monkeypatch.setenv("BIKIDATA_FTS_SETTINGS", "not json at all")
    assert fts_settings_from_env() == {}


def test_semantic_filter_ivf_store(spark, tmp_path):
    """IVF-backed semantic filter: exact distance<0.5 within the probed
    cells only, embeddings scan partition-pruned to `cell IN (...)`."""
    import re

    from bikidata_spark.operators.similarity import write_ivf_store

    quads = spark.createDataFrame(
        [(f"<e/{i}>", "<label>", f'"doc {i}"', "") for i in range(12)],
        "s string, p string, o string, g string",
    )
    g = from_string_quads(quads)
    # three clusters sharing a common component (axis 0) plus a
    # cluster axis: cross-cluster cosine ≈ 0.6 (within distance 0.5,
    # so the BRUTE scan matches everything) while each vector stays
    # nearest its own cluster's centroid (so IVF pruning bites)
    rows = []
    for i in range(12):
        base = [0.0] * 4
        base[0] = 1.0
        base[1 + i % 3] = 0.8 + 0.01 * (i % 4)
        rows.append((i, base))
    ids = spark.createDataFrame(rows, "vid int, raw array<double>")
    emb = ids.select(
        F.xxhash64(F.concat(F.lit("<e/"), F.col("vid").cast("string"), F.lit(">"))).alias("s"),
        F.col("raw").alias("vec"),
    )
    eng = Engine(g, embeddings=emb)
    # centroids: one per cluster (vids 0,1,2 lean on axes 0,1,2)
    cents = ids.filter(F.col("vid") < 3).select(
        F.col("vid").cast("long").alias("cid"), F.col("raw").alias("cv")
    )
    path = str(tmp_path / "sem_ivf")
    write_ivf_store(emb, path, "s", "vec", centroids=cents)

    qvec = rows[0][1]  # cluster 0's axis
    brute_subj, _ = eng._semantic_filter({"vector": qvec}, "", None)
    brute = {r["s"] for r in brute_subj.collect()}
    eng.load_ivf(path, nprobe=1)
    ivf_subj, ivf_scores = eng._semantic_filter({"vector": qvec}, "", None)
    got = {r["s"] for r in ivf_subj.collect()}
    # nprobe=1 probes only cluster 0's cell: its members (vids 0,3,6,9)
    want_vids = {0, 3, 6, 9}
    vid_of = {r["s"]: r["vid"] for r in emb.join(ids, emb.vec == ids.raw).select("s", "vid").collect()}
    assert {vid_of[s] for s in got} == want_vids
    # IVF results are the brute matches RESTRICTED to the probed cell
    assert got < brute  # strictly fewer: other clusters match brute too
    # scores ride along like the brute path
    assert ivf_scores.count() == len(got)
    # the executed scan partition-prunes on the cell directory
    plan = ivf_subj._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*cell", plan), plan[:1500]
    # nprobe=3 probes every cell => exactly the brute result
    eng.load_ivf(path, nprobe=3)
    all_subj, _ = eng._semantic_filter({"vector": qvec}, "", None)
    assert {r["s"] for r in all_subj.collect()} == brute
    eng._ivf = None


def test_semantic_fallback_scan_telemetry(spark, caplog):
    """A `semantic` filter served WITHOUT an IVF store must warn and
    count the full-scan fallback (a silent per-query full scan is a
    production scale-killer); the IVF-served path must not count."""
    import logging

    quads = spark.createDataFrame(
        [("<e/0>", "<label>", '"zero"', "")], "s string, p string, o string, g string"
    )
    g = from_string_quads(quads)
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vid int, raw array<double>"
    ).select(
        F.xxhash64(F.concat(F.lit("<e/"), F.col("vid").cast("string"), F.lit(">"))).alias("s"),
        F.col("raw").alias("vec"),
    )
    eng = Engine(g, embeddings=emb)
    assert eng.cache_stats()["semantic_fallback_scans"] == 0
    with caplog.at_level(logging.WARNING, logger="bikidata_spark.plans.query"):
        subj, _ = eng._semantic_filter({"vector": [1.0, 0.0]}, "", None)
        subj.collect()
    assert eng.cache_stats()["semantic_fallback_scans"] == 1
    assert any("without an IVF store" in r.message for r in caplog.records)

    # Serving.status() surfaces the counter (driver-local, no Spark job)
    from bikidata_spark.serving import Serving

    srv = Serving(eng, num_workers=1)
    try:
        assert srv.status()["subject_cache"]["semantic_fallback_scans"] == 1
    finally:
        srv.close()


def test_http_embedding_client_payload_and_error_contract(caplog):
    """Cohere parity + failure behavior: default payload carries
    truncate=END/max_tokens (reference semantic.py:28-38), 4xx (except
    429) is never retried, and a cleartext-credential URL warns."""
    import io
    import json as _json
    import logging
    import urllib.error

    import pytest as _pytest

    from bikidata_spark.functions.embed import (
        BatchedProvider,
        HttpEmbeddingClient,
        NonRetryableEmbeddingError,
    )

    class FakeResp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    bodies = []

    def ok_opener(req, timeout):
        body = _json.loads(req.data)
        bodies.append(body)
        vecs = [[0.0]] * len(body["texts"])
        return FakeResp(_json.dumps({"embeddings": {"float": vecs}}).encode())

    c = HttpEmbeddingClient("https://api.example/v2/embed", dim=1, opener=ok_opener)
    c(["x"])
    assert bodies[0]["truncate"] == "END" and bodies[0]["max_tokens"] == 8000
    # opt-out for endpoints that reject unknown fields
    c2 = HttpEmbeddingClient(
        "https://api.example/v2/embed", dim=1, opener=ok_opener, max_tokens=None, truncate=None
    )
    c2(["x"])
    assert "truncate" not in bodies[1] and "max_tokens" not in bodies[1]

    calls = {"n": 0}

    def unauthorized(req, timeout):
        calls["n"] += 1
        raise urllib.error.HTTPError(req.full_url, 401, "Unauthorized", {}, None)

    c401 = HttpEmbeddingClient("https://api.example/v2/embed", dim=1, opener=unauthorized)
    p = BatchedProvider(c401, max_retries=5, backoff_s=0, sleep=lambda s: None)
    with _pytest.raises(NonRetryableEmbeddingError):
        p.embed_many(["x"])
    assert calls["n"] == 1  # deterministic rejection: no retries

    def throttled(req, timeout):
        calls["n"] += 1
        raise urllib.error.HTTPError(req.full_url, 429, "Too Many Requests", {}, None)

    c429 = HttpEmbeddingClient("https://api.example/v2/embed", dim=1, opener=throttled)
    p429 = BatchedProvider(c429, max_retries=2, backoff_s=0, sleep=lambda s: None)
    calls["n"] = 0
    with _pytest.raises(urllib.error.HTTPError):
        p429.embed_many(["x"])
    assert calls["n"] == 3  # 429 IS retried (initial + 2 retries)

    with caplog.at_level(logging.WARNING, logger="bikidata_spark.functions.embed"):
        HttpEmbeddingClient("http://api.example/v2/embed", api_key="secret")
        HttpEmbeddingClient("http://127.0.0.1:9/v2/embed", api_key="secret")
        HttpEmbeddingClient("https://api.example/v2/embed", api_key="secret")
    warns = [r for r in caplog.records if "non-TLS" in r.message]
    assert len(warns) == 1 and "api.example" in warns[0].message


def test_build_semantic_http_end_to_end(spark, tmp_path):
    """The full production semantic chain with the REAL client class:
    graph → entity text → Arrow UDF whose HttpEmbeddingClient+
    BatchedProvider are constructed ON THE EXECUTOR (provider_factory)
    → localhost HTTP endpoint → embeddings → persisted IVF store →
    `semantic` filter served from it. No embedding call ever runs in
    the driver process (the factory asserts it)."""
    import json as _json
    import os
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from bikidata_spark.functions.embed import (
        BatchedProvider,
        HttpEmbeddingClient,
        fake_embedding,
    )
    from bikidata_spark.functions.embed import build_semantic
    from bikidata_spark.operators.similarity import write_ivf_store

    DIM = 8
    served = {"requests": 0}

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = _json.loads(self.rfile.read(int(self.headers["Content-Length"])))
            served["requests"] += 1
            vecs = [fake_embedding(t, body["output_dimension"]) for t in body["texts"]]
            reply = _json.dumps({"embeddings": {"float": vecs}}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(reply)))
            self.end_headers()
            self.wfile.write(reply)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}/v2/embed"
    driver_pid = os.getpid()

    def factory():
        # runs on the executor python worker; pyspark workers are
        # separate processes even on local[N], so this trips if the
        # embedding path ever executes driver-side
        assert os.getpid() != driver_pid, "provider constructed in the driver"
        return BatchedProvider(
            HttpEmbeddingClient(url, api_key="k", dim=DIM), batch_size=4
        )

    try:
        quads = spark.createDataFrame(
            [(f"<e/{i}>", "<label>", f'"topic {i % 3} item {i}"', "") for i in range(9)],
            "s string, p string, o string, g string",
        )
        g = from_string_quads(quads)
        emb = build_semantic(g, dim=DIM, hops=1, provider_factory=factory)
        rows = {r["s"]: r["vec"] for r in emb.collect()}
        assert len(rows) == 9 and served["requests"] >= 1
        # byte-identical to what the endpoint returns for the same text
        # (proves the HTTP round trip carried the vectors, no fallback)
        et = {r["s"]: r["text"] for r in __import__("bikidata_spark.operators.fts", fromlist=["entity_text"]).entity_text(g, hops=1).collect()}
        for s, vec in rows.items():
            assert vec == fake_embedding(et[s], DIM)

        # persist to the IVF serving layout and serve a semantic query
        path = str(tmp_path / "http_sem_ivf")
        cents = emb.limit(2).select(
            F.monotonically_increasing_id().alias("cid"), F.col("vec").alias("cv")
        )
        write_ivf_store(emb, path, "s", "vec", centroids=cents)
        eng = Engine(g, embeddings=emb)
        eng.load_ivf(path, nprobe=2)
        target = list(rows)[4]
        subj, scores = eng._semantic_filter({"vector": rows[target]}, "", None)
        got = {r["s"] for r in subj.collect()}
        assert target in got  # distance 0 to itself within probed cells
        assert eng.cache_stats()["semantic_fallback_scans"] == 0  # IVF path, not brute
    finally:
        srv.shutdown()
        srv.server_close()


def test_stem_gate_identity_split_is_exact(spark):
    """token_postings' numeric/short identity gate must be invisible:
    the gated split (tower only on possibly-changing tokens) equals
    brute stemming of EVERY posting row, including the one collision
    the gate could get wrong — "12s" stems to "12" and must MERGE with
    a document's existing "12" token into a single postings row."""
    from pyspark.sql import functions as F

    from bikidata_spark.functions.porter import stem_tokens_df
    from bikidata_spark.operators.fts import token_postings, tokens_col

    lits = spark.createDataFrame(
        [
            (1, "12 12s 12 alphas running 9"),
            (2, "555 0042 glasses ponies ab 12s"),
            (3, "only words stemming happily"),
        ],
        "hash long, value string",
    )
    toks = lits.select(
        F.col("hash").alias("lit"),
        F.explode(tokens_col(F.col("value"), True)).alias("token"),
    )
    gated = {
        (r["lit"], r["token"], r["tf"])
        for r in token_postings(toks, stem=True).collect()
    }
    raw = toks.groupBy("lit", "token").agg(F.count("*").alias("tf"))
    brute = {
        (r["lit"], r["token"], r["tf"])
        for r in stem_tokens_df(raw, "token")
        .groupBy("lit", "token")
        .agg(F.sum("tf").alias("tf"))
        .collect()
    }
    assert gated == brute
    # the collision row really merged: doc 1 has 12, 12, 12s -> tf 3
    assert (1, "12", 3) in gated


def test_ivf_probe_cells_driver_matches_spark_job(spark, tmp_path):
    """r14: load_ivf collects the tiny centroid table once and
    _semantic_filter resolves probe cells DRIVER-SIDE
    (local_tier.probe_cells_fold) instead of running a Spark job per
    query. The resolution must be bit-identical to the _nearest_cells
    HOF job it replaces — fuzzed over random vectors plus the edge
    shapes (exact centroid hit, exact two-centroid tie). Zero-norm
    rows are NOT a reachable store state: ANSI mode makes the
    assignment fold raise DIVIDE_BY_ZERO at write_ivf_store time (and
    a zero-norm QUERY vector still raises at action time on the new
    path — pinned below)."""
    import numpy as np

    from bikidata_spark.operators.similarity import (
        _cent_arr,
        _nearest_cells,
        write_ivf_store,
    )
    from bikidata_spark.plans.local_tier import probe_cells_fold

    rng = np.random.default_rng(7)
    vecs = [(i, [float(x) for x in rng.normal(size=6)]) for i in range(40)]
    emb = spark.createDataFrame(vecs, "s long, vec array<double>")
    cent_rows = [(int(i), v) for i, v in vecs[:7]]
    cents = spark.createDataFrame(cent_rows, "cid long, cv array<double>")
    path = str(tmp_path / "probe_ivf")
    write_ivf_store(emb, path, "s", "vec", centroids=cents)

    g = from_string_quads(
        spark.createDataFrame(
            [("<e/1>", "<label>", '"x"', "")], "s string, p string, o string, g string"
        )
    )
    eng = Engine(g, embeddings=emb)
    eng.load_ivf(path, nprobe=3)
    vectors, store_cents, nprobe = eng._ivf
    assert eng._ivf_probe is not None
    # the twin is identity-keyed to THIS load's centroid frame (a torn
    # concurrent re-load must fail the check and take the job path)
    assert eng._ivf_probe[0] is store_cents
    _, cids, cent_mat = eng._ivf_probe

    queries = [v for _, v in vecs[:5]]
    queries.append(cent_rows[2][1])  # exact centroid hit
    # exact tie between two centroids: their midpoint (equal cosine)
    a, b = np.array(cent_rows[0][1]), np.array(cent_rows[1][1])
    queries.append([float(x) for x in (a / np.linalg.norm(a) + b / np.linalg.norm(b))])
    queries.extend([[float(x) for x in rng.normal(size=6)] for _ in range(10)])

    carr = _cent_arr(store_cents)
    for q in queries:
        qdf = spark.createDataFrame([(q,)], "qvec array<double>")
        spark_cells = sorted(
            r["cell"]
            for r in qdf.crossJoin(F.broadcast(carr))
            .select(
                F.explode(_nearest_cells(F.col("qvec"), F.col("cents"), nprobe)).alias(
                    "cell"
                )
            )
            .collect()
        )
        driver_cells = probe_cells_fold(
            cids, cent_mat, np.array(q, dtype=np.float64), nprobe
        )
        assert driver_cells == spark_cells, (q, driver_cells, spark_cells)

    # a zero-norm query vector still surfaces the ANSI DIVIDE_BY_ZERO
    # at action time (the scored-frame cosine), as the old probe-job
    # path did — the driver-side resolution must not swallow it into a
    # silent wrong answer
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import ArithmeticException

    subj, _ = eng._semantic_filter({"vector": [0.0] * 6}, "", None)
    with _pytest.raises(ArithmeticException):
        subj.count()
    eng._ivf = None
