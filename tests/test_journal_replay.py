"""Serving journal → streaming-store replay (durability bridge).

With ``journal_dir`` set, every successful serving mutation appends one
JSON-lines file in the streaming mutation format; replaying it through
``start_ingest(max_files_per_trigger=1)`` must reproduce the served
engine's graph EXACTLY — which requires the store's new sequenced
tombstones (a tombstone kills only earlier batches' rows, so
insert → delete → re-insert resurrects) plus the new wildcard and
hash-addressed delete record forms.
"""

from __future__ import annotations

import asyncio
import json

import pytest


def _write_ordered(src, batches):
    """One file per batch with STRICTLY increasing mtimes — the file
    source orders batches by modification time, and files written in
    the same tick would replay in undefined order."""
    import os
    import time

    base = time.time() - 1000
    for i, recs in enumerate(batches):
        p = src / f"{i:04d}.json"
        p.write_text("\n".join(json.dumps(r) for r in recs) + "\n")
        os.utime(p, (base + i, base + i))


def _mk_engine(spark):
    from bikidata_spark import Engine, from_string_quads

    quads = spark.createDataFrame(
        [
            ("<j/1>", "<p/t>", "<t/0>", ""),
            ("<j/2>", "<p/t>", "<t/1>", "<g/1>"),
            ("<j/3>", "<p/lbl>", '"three"', ""),
        ],
        "s string, p string, o string, g string",
    )
    g = from_string_quads(quads).cache()
    g.triples.count()
    eng = Engine(g)
    eng.query({"filters": [{"p": "<p/t>"}], "size": 1})  # warm tier
    return eng


def _graph_rows(graph):
    return (
        sorted(map(tuple, graph.triples.collect())),
        sorted(map(tuple, graph.terms.collect())),
    )


def test_store_sequenced_tombstones_and_wildcards(spark, tmp_path):
    """insert → delete → RE-INSERT must resurrect (sequencing), and
    wildcard / hash-addressed delete records must apply."""
    from bikidata_spark.functions.xxh import term_id
    from bikidata_spark.streaming.mutations import read_store, start_ingest

    src = tmp_path / "src"
    src.mkdir()
    batches = [
        [{"action": "insert", "s": "<a>", "p": "<p>", "o": '"one"', "g": ""},
         {"action": "insert", "s": "<b>", "p": "<p>", "o": '"two"', "g": ""},
         {"action": "insert", "s": "<c>", "p": "<q>", "o": '"three"', "g": ""}],
        [{"action": "delete", "s": "<a>", "p": "<p>", "o": '"one"', "g": ""}],
        [{"action": "insert", "s": "<a>", "p": "<p>", "o": '"one"', "g": ""}],  # resurrect
        [{"action": "delete", "s": "<b>", "p": "<p>", "o": "", "g": ""}],  # wildcard
        [{"action": "delete_hashes", "s": str(term_id("<c>")),
          "p": str(term_id("<q>")), "o": "", "g": ""}],  # hash wildcard
    ]
    _write_ordered(src, batches)
    q = start_ingest(
        spark, str(src), str(tmp_path / "store"), str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    g = read_store(spark, str(tmp_path / "store"))
    rows = sorted(map(tuple, g.triples.collect()))
    want = sorted(
        [(term_id("<a>"), term_id("<p>"), term_id('"one"'), term_id(""))]
    )
    assert rows == want  # <a> resurrected; <b>, <c> wildcard-deleted


def test_compact_preserves_sequenced_semantics(spark, tmp_path):
    from bikidata_spark.functions.xxh import term_id
    from bikidata_spark.streaming.mutations import compact_store, read_store, start_ingest

    src = tmp_path / "src"
    src.mkdir()
    batches = [
        [{"action": "insert", "s": "<a>", "p": "<p>", "o": '"one"', "g": ""}],
        [{"action": "delete", "s": "<a>", "p": "<p>", "o": "", "g": ""}],
        [{"action": "insert", "s": "<a>", "p": "<p>", "o": '"one"', "g": ""}],
    ]
    _write_ordered(src, batches)
    q = start_ingest(
        spark, str(src), str(tmp_path / "store"), str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    before = sorted(map(tuple, read_store(spark, str(tmp_path / "store")).triples.collect()))
    stats = compact_store(spark, str(tmp_path / "store"))
    after = sorted(map(tuple, read_store(spark, str(tmp_path / "store")).triples.collect()))
    assert before == after == [
        (term_id("<a>"), term_id("<p>"), term_id('"one"'), term_id(""))
    ]
    assert stats["triples"] == 1


def test_serving_journal_replays_to_identical_store(spark, tmp_path):
    """Mixed mutation forms through the Serving facade, journal replayed
    into a store: the store's graph must equal the served engine's."""
    from bikidata_spark.functions.xxh import term_id
    from bikidata_spark.serving import Serving
    from bikidata_spark.streaming.mutations import read_store, start_ingest

    eng = _mk_engine(spark)
    base_triples = sorted(map(tuple, eng.graph.triples.collect()))
    srv = Serving(eng, num_workers=2, journal_dir=str(tmp_path / "journal"))

    async def run():
        assert (await srv.insert_async("<j/4>", "<p/t>", '"four"'))["triples_inserted"] == 1
        assert (await srv.insert_async("<j/5>", "<p/t>", "<t/2>", "<g/1>"))["triples_inserted"] == 1
        assert (await srv.delete_async("<j/4>", "<p/t>", '"four"'))["triples_deleted"] == 1
        # re-insert after delete: the replay must resurrect it
        assert (await srv.insert_async("<j/4>", "<p/t>", '"four"'))["triples_inserted"] == 1
        # wildcard delete
        assert (await srv.delete_async("<j/1>", "<p/t>", None))["triples_deleted"] == 1
        # hash-addressed wildcard delete
        assert (
            await srv.delete_async(
                str(term_id("<j/2>")), str(term_id("<p/t>")), None, are_hashes=True
            )
        )["triples_deleted"] == 1
        # a FAILED mutation must not be journaled
        assert "error" in (await srv.insert_async("<j/4>", "<p/t>", '"four"'))

    asyncio.run(run())
    srv.close()

    # seed the replay store with the BASE graph (the journal covers the
    # serving-era mutations; the base corpus arrives like any bulk load)
    src = tmp_path / "journal"
    seed = [
        {"action": "insert", "s": s, "p": p, "o": o, "g": g}
        for (s, p, o, g) in [
            ("<j/1>", "<p/t>", "<t/0>", ""),
            ("<j/2>", "<p/t>", "<t/1>", "<g/1>"),
            ("<j/3>", "<p/lbl>", '"three"', ""),
        ]
    ]
    seed_path = src / "000000000000.json"
    seed_path.write_text("\n".join(json.dumps(r) for r in seed) + "\n")
    # the file source orders batches by MODIFICATION time — backdate the
    # seed so it replays before the journal files it was written after
    import os

    first = min(p.stat().st_mtime for p in src.glob("*.json") if p != seed_path)
    os.utime(seed_path, (first - 10, first - 10))
    q = start_ingest(
        spark, str(src), str(tmp_path / "store"), str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    store_graph = read_store(spark, str(tmp_path / "store"))
    assert sorted(map(tuple, store_graph.triples.collect())) == sorted(
        map(tuple, eng.graph.triples.collect())
    )
    # terms: the store holds at least every term the engine's graph does
    eng_terms = {tuple(r) for r in eng.graph.terms.collect()}
    store_terms = {tuple(r) for r in store_graph.terms.collect()}
    assert eng_terms <= store_terms


def test_snapshot_reads_sequenced_tombstones(spark, tmp_path):
    """read_snapshot must apply the same sequenced (exact + wildcard)
    tombstone semantics as read_store — resurrects included."""
    from bikidata_spark.streaming.manifest import commit_snapshot, read_snapshot
    from bikidata_spark.streaming.mutations import read_store, start_ingest

    src = tmp_path / "src"
    src.mkdir()
    batches = [
        [{"action": "insert", "s": "<a>", "p": "<p>", "o": '"one"', "g": ""},
         {"action": "insert", "s": "<b>", "p": "<p>", "o": '"two"', "g": ""}],
        [{"action": "delete", "s": "<a>", "p": "<p>", "o": "", "g": ""}],  # wildcard
        [{"action": "insert", "s": "<a>", "p": "<p>", "o": '"one"', "g": ""}],  # resurrect
        [{"action": "delete", "s": "<b>", "p": "<p>", "o": '"two"', "g": ""}],  # exact
    ]
    _write_ordered(src, batches)
    q = start_ingest(
        spark, str(src), str(tmp_path / "store"), str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    store = str(tmp_path / "store")
    commit_snapshot(store)
    snap = read_snapshot(spark, store)
    live = read_store(spark, store)
    a = sorted(map(tuple, snap.triples.collect()))
    b = sorted(map(tuple, live.triples.collect()))
    assert a == b and len(a) == 1  # only the resurrected <a>


def test_cli_replay_and_query_honor_tombstones(spark, tmp_path, capsys):
    """`python -m bikidata_spark replay` then `query`/`total`: the CLI
    read path must route log-structured stores through read_store
    (raw triples parquet would resurrect deleted quads)."""
    from bikidata_spark.__main__ import main

    src = tmp_path / "journal"
    src.mkdir()
    batches = [
        [{"action": "insert", "s": "<r/1>", "p": "<p>", "o": '"one"', "g": ""}],
        [{"action": "insert", "s": "<r/2>", "p": "<p>", "o": '"two"', "g": ""}],
        [{"action": "delete", "s": "<r/2>", "p": "<p>", "o": "", "g": ""}],
    ]
    _write_ordered(src, batches)
    store = str(tmp_path / "store")
    assert main(["replay", str(src), store]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["triples"] == 1
    assert main(["query", store, json.dumps({"filters": [{"p": "<p>"}], "size": 10})]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["total"] == 1 and list(res["results"]) == ["<r/1>"]


def test_journal_restart_resumes_sequence(spark, tmp_path):
    """A Serving restarted onto an existing journal_dir must CONTINUE
    the file sequence — starting from 0 would rename onto the earliest
    existing file, destroying it (and incremental replay, which tracks
    seen files by path, would skip the reused name entirely)."""
    from bikidata_spark.serving import Serving
    from bikidata_spark.streaming.mutations import read_store, start_ingest

    jdir = tmp_path / "journal"

    eng = _mk_engine(spark)
    srv = Serving(eng, num_workers=2, journal_dir=str(jdir))

    async def first_life():
        assert (await srv.insert_async("<j/4>", "<p/t>", '"four"'))["triples_inserted"] == 1
        assert (await srv.insert_async("<j/5>", "<p/t>", '"five"'))["triples_inserted"] == 1

    asyncio.run(first_life())
    srv.close()
    files_before = sorted(p.name for p in jdir.glob("*.json"))
    assert files_before == ["000000000001.json", "000000000002.json"]

    # "crash" and restart a fresh Serving over the SAME journal_dir,
    # with a fresh engine holding the state the journal left behind
    eng2 = _mk_engine(spark)
    eng2.mutate("insert", [{"s": "<j/4>", "p": "<p/t>", "o": '"four"'}])
    eng2.mutate("insert", [{"s": "<j/5>", "p": "<p/t>", "o": '"five"'}])
    srv2 = Serving(eng2, num_workers=2, journal_dir=str(jdir))
    assert srv2._journal_seq == 2  # resumed, not reset

    async def second_life():
        assert (await srv2.delete_async("<j/4>", "<p/t>", '"four"'))["triples_deleted"] == 1

    asyncio.run(second_life())
    srv2.close()
    files_after = sorted(p.name for p in jdir.glob("*.json"))
    assert files_after == [
        "000000000001.json", "000000000002.json", "000000000003.json"
    ]
    # earlier records intact (nothing clobbered)
    recs1 = [json.loads(l) for l in (jdir / "000000000001.json").read_text().splitlines()]
    assert recs1[0]["action"] == "insert" and recs1[0]["o"] == '"four"'
    # mtimes still strictly increasing across the restart (replay order)
    mtimes = [(jdir / n).stat().st_mtime for n in files_after]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == 3

    # full replay of the surviving journal reproduces the served state
    q = start_ingest(
        spark, str(jdir), str(tmp_path / "store"), str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, read_store(spark, str(tmp_path / "store")).triples.collect()))
    from bikidata_spark.functions.xxh import term_id

    assert got == sorted([(term_id("<j/5>"), term_id("<p/t>"), term_id('"five"'), term_id(""))])


def test_journal_failure_degrades_to_non_durable(spark, tmp_path):
    """If the journal write fails AFTER the in-memory apply, the serving
    instance must stop journaling (a gap makes replay silently
    divergent) and surface the degradation in status()."""
    from bikidata_spark.serving import Serving

    eng = _mk_engine(spark)
    srv = Serving(eng, num_workers=2, journal_dir=str(tmp_path / "journal"))
    assert srv.status()["durable"] is True

    def boom(*a, **k):
        raise OSError("No space left on device")

    srv._journal = boom

    async def run():
        res = await srv.insert_async("<j/9>", "<p/t>", '"nine"')
        # the mutation itself succeeded (served state has it) ...
        assert res["triples_inserted"] == 1
        # ... but the degradation is surfaced on the result
        assert "No space left" in res["journal_error"]

    asyncio.run(run())
    st = srv.status()
    assert st["durable"] is False and "No space left" in st["journal_error"]
    # engine state retained the mutation; queries see it
    assert eng.query({"filters": [{"p": "<p/t>", "o": '"nine"'}]})["total"] == 1
    srv.close()


def test_journal_rotation_bounds_files_and_replays(spark, tmp_path):
    """Long-lived serving: past journal_rotate_files live files the
    journal folds into {journal_dir}/_compacted and deletes them — the
    file count stays bounded, the sequence survives even a full fold
    (_seq high-water mark), and replay_journal (compacted seed + live
    tail) reproduces the served engine exactly across two rotations and
    a restart."""
    import os

    from bikidata_spark.serving import Serving
    from bikidata_spark.streaming.mutations import read_store, replay_journal

    jdir = tmp_path / "journal"
    jdir.mkdir()
    # with rotation the journal must be SELF-CONTAINED: the base corpus
    # flows through it too (here: a backdated bulk-load file)
    seed = [
        {"action": "insert", "s": s, "p": p, "o": o, "g": g}
        for (s, p, o, g) in [
            ("<j/1>", "<p/t>", "<t/0>", ""),
            ("<j/2>", "<p/t>", "<t/1>", "<g/1>"),
            ("<j/3>", "<p/lbl>", '"three"', ""),
        ]
    ]
    sp = jdir / "000000000000.json"
    sp.write_text("\n".join(json.dumps(r) for r in seed) + "\n")
    import time as _time

    t0 = _time.time() - 1000
    os.utime(sp, (t0, t0))

    eng = _mk_engine(spark)
    srv = Serving(eng, num_workers=2, journal_dir=str(jdir), journal_rotate_files=4)

    async def life1():
        assert (await srv.insert_async("<j/4>", "<p/t>", '"four"'))["triples_inserted"] == 1
        assert (await srv.insert_async("<j/5>", "<p/t>", '"five"'))["triples_inserted"] == 1
        # this 3rd write trips the rotation (seed + 3 live files >= 4)
        assert (await srv.delete_async("<j/4>", "<p/t>", '"four"'))["triples_deleted"] == 1
        # post-rotation tail: the delete→re-insert pair SPANS the fold,
        # so replay must sequence the compacted prefix before the tail
        assert (await srv.insert_async("<j/4>", "<p/t>", '"four"'))["triples_inserted"] == 1
        assert (await srv.delete_async("<j/1>", "<p/t>", None))["triples_deleted"] == 1
        assert (await srv.insert_async("<j/6>", "<p/t>", '"six"'))["triples_inserted"] == 1

    def _wait_rotated(s, n=1, timeout=180):
        import time as _t

        t0 = _t.time()
        while _t.time() - t0 < timeout:
            stt = s.status()
            if stt["journal_rotations"] >= n and not stt["journal_rotating"]:
                assert stt["journal_rotation_error"] is None
                return
            _t.sleep(0.1)
        raise AssertionError(f"rotation did not complete: {s.status()}")

    asyncio.run(life1())
    # rotation runs on a BACKGROUND thread (the fold must not stall the
    # mutation path): the mutations above returned immediately; wait for
    # the fold to commit before checking the folded state
    _wait_rotated(srv)
    st = srv.status()
    assert st["journal_rotations"] == 1
    assert st["journal_live_files"] == 3
    assert len(list(jdir.glob("*.json"))) == 3  # bounded on disk too
    assert (jdir / "_compacted" / "triples").is_dir()
    srv.close()

    # mid-stream replay: compacted seed + live tail == served engine
    q = replay_journal(spark, str(jdir), str(tmp_path / "store1"))
    q.awaitTermination(120)
    got = sorted(map(tuple, read_store(spark, str(tmp_path / "store1")).triples.collect()))
    assert got == sorted(map(tuple, eng.graph.triples.collect()))

    # restart with rotate-every-write: the next mutation folds EVERY
    # live file away; the sequence must survive via _seq
    srv2 = Serving(eng, num_workers=2, journal_dir=str(jdir), journal_rotate_files=1)
    assert srv2._journal_seq == 6  # resumed from the live files

    async def life2():
        assert (await srv2.delete_async("<j/5>", "<p/t>", '"five"'))["triples_deleted"] == 1

    asyncio.run(life2())
    _wait_rotated(srv2)
    assert srv2.status()["journal_rotations"] == 1
    assert len(list(jdir.glob("*.json"))) == 0  # fully folded
    srv2.close()

    srv3 = Serving(eng, num_workers=2, journal_dir=str(jdir))
    assert srv3._journal_seq == 7  # from _seq, not the (empty) file list

    async def life3():
        assert (await srv3.insert_async("<j/7>", "<p/t>", '"seven"'))["triples_inserted"] == 1

    asyncio.run(life3())
    assert sorted(p.name for p in jdir.glob("*.json")) == ["000000000008.json"]
    srv3.close()

    # full replay of the twice-rotated journal == final served state
    q = replay_journal(spark, str(jdir), str(tmp_path / "store2"))
    q.awaitTermination(120)
    got = sorted(map(tuple, read_store(spark, str(tmp_path / "store2")).triples.collect()))
    assert got == sorted(map(tuple, eng.graph.triples.collect()))
