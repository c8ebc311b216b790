"""Forked multiprocess serving front-end over the driver-resident tier.

With the local tier resident, a point query is pure Python/numpy — so
the thread-pool facade (serving.Serving) hits the GIL at ~74 QPS no
matter how many threads it runs (tools/serving_sweep.py, r8). The
reference sidesteps the GIL with forked DuckDB worker PROCESSES over
Redis queues (reference workers.py:23-56); this module is the
Spark-resident equivalent: N processes forked from the driver, each
inheriting the tier mirror copy-on-write (numpy array pages are
refcount-free, so the quad columns stay physically shared), serving
``LocalTier.try_query`` without the GIL of the parent — or of each
other.

Protocol (one duplex pipe per worker, strictly request/response):

- ``("q", opts)``  → ``("r", result | None)`` — None = the tier bailed
  (regex filter, over-cap fts/semantic mirror, paths cache miss);
  the parent runs the distributed path, exactly as the in-process
  tier path would have.
- ``("m", delta)`` → ``("ok", None)`` — replay one Engine.mutate tier
  patch. The delta is the exact ``LocalTier.patched`` argument tuple
  the parent applied (plans/query.Engine._retier records it), so an
  identically-evolved fork lands on a byte-identical mirror: same
  physical row ids, same overlay fold points, same BM25 increments
  (``patch_fts_mirror`` with the same posting rows).
- ``("x", None)``  → ``("bye", None)`` and the worker exits.

The forked child inherits the py4j gateway socket but MUST NOT use it:
``engine._frozen = True`` makes every Spark-needing path inside
``try_query`` bail to the parent instead (plans/local_tier.py guards
on ``_local_fts`` / ``_local_semantic`` / the paths walk). ``paths``
queries additionally bail after the first mutation broadcast — the
forked hierarchy maps are fork-time snapshots and a mutation may have
edited the hierarchy.

Fork-safety contract: construct the pool while the engine is QUIESCENT
(no in-flight queries — e.g. at Serving construction), so no engine or
tier lock is held at fork time. Mutation broadcasts check out every
worker before sending, so per-worker pipe FIFO order guarantees a
worker never serves a query dispatched after a mutation against the
pre-mutation mirror.

Memory: quad columns and sorted indexes share pages CoW for the
process lifetime. Python dict/str objects (the term dictionary) are
copied page-by-page as refcounts are touched; ``gc.freeze()`` in the
child keeps the collector from forcing that eagerly.
"""

from __future__ import annotations

import queue
import threading

import numpy as np


def _child_main(conn, engine, fts_max_rows: int) -> None:
    """Worker loop — runs in the forked child. Never touches Spark."""
    import gc
    import os

    gc.freeze()  # inherited objects: don't let GC touch their pages
    engine._frozen = True
    st = engine._local_tier_state
    tier = st[1] if st is not None else None
    paths_ok = True  # until the first mutation (see module docstring)
    while True:
        try:
            msg = conn.recv()
        except (EOFError, OSError):
            os._exit(0)
        kind, payload = msg
        try:
            if kind == "q":
                if tier is None or (not paths_ok and payload.get("paths")):
                    conn.send(("r", None))
                    continue
                conn.send(("r", tier.try_query(engine, payload, fts_max_rows)))
            elif kind == "m":
                for h, v in payload["terms"]:
                    tier.h2v[h] = v
                    tier.v2h[v] = h
                    if v.startswith('"'):
                        tier.is_lit.add(h)
                new_tier = tier.patched(
                    payload["ins"],
                    np.asarray(payload["del"], dtype=np.int64),
                    payload["terms"],
                )
                fts = payload["fts"]
                if fts == "keep":
                    new_tier._fts_state = tier._fts_state
                elif isinstance(fts, tuple) and fts[0] == "rows":
                    from .plans.local_tier import patch_fts_mirror

                    fst = tier._fts_state
                    if fst is not None and fst[1] is not None:
                        new_tier._fts_state = (
                            fst[0],
                            patch_fts_mirror(fst[1], fts[1], fts[2], fts[3]),
                        )
                # "drop": mirror stays unbuilt; fts queries bail to parent
                tier = new_tier
                paths_ok = False
                conn.send(("ok", None))
            elif kind == "x":
                conn.send(("bye", None))
                conn.close()
                os._exit(0)
            else:
                conn.send(("err", f"unknown message kind {kind!r}"))
        except Exception as e:  # keep the loop alive; parent falls back
            try:
                conn.send(("err", f"{type(e).__name__}: {e}"))
            except (OSError, BrokenPipeError):
                os._exit(1)


class TierProcPool:
    """N forked read-only tier workers + a mutation broadcast channel."""

    def __init__(self, engine, n_procs: int = 8, query_timeout_s: float = 600.0):
        import multiprocessing as mp

        st = engine._local_tier_state
        if st is None or st[0] != engine._graph_generation or st[1] is None:
            raise ValueError(
                "TierProcPool needs a resident local tier (warm the engine "
                "with one query before constructing the pool)"
            )
        self._timeout = query_timeout_s
        self._lock = threading.Lock()
        self._workers: list = []  # (process, parent_conn) tuples
        self._idle: queue.Queue = queue.Queue()
        self._n_live = 0
        self._bails = 0
        self._served = 0
        self._worker_errors = 0
        ctx = mp.get_context("fork")
        fts_rows = engine.local_tier_fts_rows
        for _ in range(n_procs):
            parent_conn, child_conn = ctx.Pipe(duplex=True)
            proc = ctx.Process(
                target=_child_main, args=(child_conn, engine, fts_rows), daemon=True
            )
            proc.start()
            child_conn.close()
            w = (proc, parent_conn)
            self._workers.append(w)
            self._idle.put(w)
            self._n_live += 1

    @property
    def alive(self) -> bool:
        return self._n_live > 0

    @property
    def n_procs(self) -> int:
        return self._n_live

    def _drop(self, w) -> None:
        with self._lock:
            if w in self._workers:
                self._workers.remove(w)
                self._n_live -= 1
        try:
            w[1].close()
        except OSError:
            pass
        if w[0].is_alive():
            w[0].terminate()

    def query(self, opts: dict) -> dict | None:
        """Round-trip one query through an idle worker. Returns the
        reference-shaped result dict, or None when the tier bailed /
        the worker failed (caller runs the distributed path)."""
        try:
            w = self._idle.get(timeout=self._timeout)
        except queue.Empty:
            return None
        healthy = True
        try:
            w[1].send(("q", opts))
            if not w[1].poll(self._timeout):
                healthy = False
                return None
            kind, payload = w[1].recv()
        except (EOFError, OSError, BrokenPipeError):
            healthy = False
            return None
        finally:
            if healthy:
                self._idle.put(w)
            else:
                self._drop(w)
        if kind == "r":
            with self._lock:
                if payload is None:
                    self._bails += 1
                else:
                    self._served += 1
            return payload
        with self._lock:  # "err"
            self._worker_errors += 1
        return None

    def apply_mutation(self, delta: dict) -> None:
        """Broadcast one tier patch to every worker and await the acks.
        Checks out ALL workers first, so no query can interleave with
        the patch on any worker's pipe."""
        payload = {
            "ins": list(delta["ins"]),
            "del": np.asarray(delta["del"], dtype=np.int64),
            "terms": list(delta["terms"]),
            "fts": delta["fts"],
        }
        held = []
        n = self._n_live
        while len(held) < n:
            try:
                held.append(self._idle.get(timeout=self._timeout))
            except queue.Empty:
                break  # dropped workers shrink the pool under us
            n = self._n_live
        for w in held:
            ok = True
            try:
                w[1].send(("m", payload))
                kind, _ = w[1].recv()
                ok = kind == "ok"
            except (EOFError, OSError, BrokenPipeError):
                ok = False
            if ok:
                self._idle.put(w)
            else:
                self._drop(w)

    def stats(self) -> dict:
        with self._lock:
            return {
                "procs": self._n_live,
                "served": self._served,
                "bails": self._bails,
                "worker_errors": self._worker_errors,
            }

    def close(self) -> None:
        with self._lock:
            workers, self._workers = list(self._workers), []
            self._n_live = 0
        for w in workers:
            try:
                w[1].send(("x", None))
            except (OSError, BrokenPipeError):
                pass
        for w in workers:
            w[0].join(timeout=2.0)
            if w[0].is_alive():
                w[0].terminate()
            try:
                w[1].close()
            except OSError:
                pass
