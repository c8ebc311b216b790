"""Embedding provider seam.

The reference calls a hosted embedding API (reference semantic.py:15-38,
Cohere embed-v4.0, dim 1024). This container has no network access, so
the provider is pluggable: pass ``embed_fn`` to the Engine, or rely on
``fake_embedding`` — a deterministic md5-seeded pseudo-embedding that
keeps every downstream code path (vector literals, broadcast, cosine
math) real and testable.
"""

from __future__ import annotations

import hashlib
import math
import time


class BatchedProvider:
    """Adapter for a hosted batch-embedding endpoint (the reference
    posts 96 texts per call, semantic.py:28-87): batching, bounded
    retry with exponential backoff, and a minimum-interval rate limit.

    ``call(texts: list[str]) -> list[list[float]]`` is the raw
    endpoint. The adapter is executor-local by design — construct it
    INSIDE the UDF/partition (or pass it pickled; it holds no
    connections until first use), so 1000 executors each pace their own
    request stream instead of funnelling through driver state. In this
    sandbox there is no network, so tests drive it with fakes; the
    batching/retry/pacing logic is the real production seam."""

    def __init__(
        self,
        call,
        batch_size: int = 96,
        max_retries: int = 3,
        backoff_s: float = 0.5,
        min_interval_s: float = 0.0,
        sleep=time.sleep,
        clock=time.monotonic,
    ):
        self.call = call
        self.batch_size = batch_size
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.min_interval_s = min_interval_s
        self._sleep = sleep
        self._clock = clock
        self._last_call = None

    def _paced_call(self, chunk: list[str]) -> list[list[float]]:
        if self.min_interval_s and self._last_call is not None:
            wait = self.min_interval_s - (self._clock() - self._last_call)
            if wait > 0:
                self._sleep(wait)
        attempt = 0
        while True:
            try:
                self._last_call = self._clock()
                out = self.call(chunk)
                if len(out) != len(chunk):
                    raise ValueError(
                        f"provider returned {len(out)} vectors for {len(chunk)} texts"
                    )
                return out
            except Exception:
                if attempt >= self.max_retries:
                    raise
                self._sleep(self.backoff_s * (2**attempt))
                attempt += 1

    def embed_many(self, texts: list[str]) -> list[list[float]]:
        out: list[list[float]] = []
        for i in range(0, len(texts), self.batch_size):
            out.extend(self._paced_call(texts[i : i + self.batch_size]))
        return out


def build_semantic(graph, dim: int = 64, hops: int = 2, embed_fn=None, provider=None):
    """Build the per-subject embedding table (s, vec) from entity text
    (reference semantic.py:41-87: embeds the ``fts`` table rows in
    batches). Spark-native: entity_text → Arrow-batched pandas UDF, so
    embedding runs partition-parallel (the reference loops batches in
    one process). Pass ``provider`` (a :class:`BatchedProvider`) to hit
    a real batch endpoint with retry/pacing; with no codec/API in this
    container, the default is the deterministic fake."""
    from pyspark.sql.functions import pandas_udf

    from ..operators.fts import entity_text

    fn = embed_fn or fake_embedding

    if provider is not None:

        @pandas_udf("array<double>")
        def embed(texts):
            import pandas as pd

            vecs = provider.embed_many([t or "" for t in texts])
            return pd.Series(vecs)

    else:

        @pandas_udf("array<double>")
        def embed(texts):
            return texts.map(lambda t: fn(t or "", dim))

    et = entity_text(graph, hops=hops)
    return et.select("s", embed("text").alias("vec"))


def fake_embedding(text: str, dim: int = 64) -> list[float]:
    """Deterministic unit-norm pseudo-embedding of ``text``."""
    out: list[float] = []
    i = 0
    while len(out) < dim:
        h = hashlib.md5(f"{text}\x00{i}".encode("utf-8")).digest()
        for j in range(0, len(h), 4):
            v = int.from_bytes(h[j : j + 4], "big")
            out.append((v / 2**31) - 1.0)
            if len(out) >= dim:
                break
        i += 1
    norm = math.sqrt(sum(x * x for x in out)) or 1.0
    return [x / norm for x in out]
