"""Async serving facade: concurrency, cache, timeout, mutations
(reference workers.py semantics without the Redis queue)."""

from __future__ import annotations

import asyncio

import pytest

from bikidata_spark import Engine, Serving, TimeoutError, build_from_iterator

TRIPLES = [
    ("<e/1>", "<p/name>", '"alpha"'),
    ("<e/2>", "<p/name>", '"beta"'),
    ("<e/2>", "<p/parent>", "<e/1>"),
    ("<e/3>", "<p/name>", '"gamma"'),
]


@pytest.fixture()
def serving(spark):
    graph = build_from_iterator(spark, TRIPLES).cache()
    return Serving(Engine(graph), num_workers=2)


def test_query_async_and_cache(serving):
    async def go():
        opts = {"filters": [{"p": "<p/name>", "o": '"alpha"'}]}
        r1 = await serving.query_async(opts)
        r2 = await serving.query_async(opts)  # cache hit
        return r1, r2

    r1, r2 = asyncio.run(go())
    assert list(r1["results"].keys()) == ["<e/1>"]
    assert r1["results"] == r2["results"]
    assert len(serving._cache) == 1


def test_concurrent_queries(serving):
    async def go():
        tasks = [
            serving.query_async({"filters": [{"p": "<p/name>", "o": f'"{v}"'}]})
            for v in ("alpha", "beta", "gamma")
        ]
        return await asyncio.gather(*tasks)

    rs = asyncio.run(go())
    assert [list(r["results"]) for r in rs] == [["<e/1>"], ["<e/2>"], ["<e/3>"]]


def test_query_timeout(serving):
    with pytest.raises(TimeoutError):
        asyncio.run(serving.query_async({"filters": [{"p": "<p/name>", "o": '"alpha"'}], "use_cache": False}, timeout=0.001))


def test_insert_then_delete_roundtrip(serving):
    async def go():
        out = []
        out.append(await serving.insert_async("<e/4>", "<p/name>", '"delta"'))
        out.append(await serving.query_async({"filters": [{"p": "<p/name>", "o": '"delta"'}]}))
        out.append(await serving.insert_async("<e/4>", "<p/name>", '"delta"'))  # dup
        out.append(await serving.delete_async("<e/4>", "<p/name>", '"delta"'))
        out.append(await serving.query_async({"filters": [{"p": "<p/name>", "o": '"delta"'}], "use_cache": False}))
        return out

    ins, q1, dup, dele, q2 = asyncio.run(go())
    assert ins["triples_inserted"] == 1
    assert list(q1["results"]) == ["<e/4>"]
    assert "error" in dup
    assert dele["triples_deleted"] == 1
    assert q2["results"] == {}


def test_build_from_iterator_batches(spark):
    g = build_from_iterator(spark, iter(TRIPLES), batch_size=2)
    assert g.triples.count() == 4
    assert g.terms.filter("is_literal").count() == 3
