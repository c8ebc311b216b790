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


def build_semantic(graph, dim: int = 64, hops: int = 2, embed_fn=None):
    """Build the per-subject embedding table (s, vec) from entity text
    (reference semantic.py:41-87: embeds the ``fts`` table rows in
    batches). Spark-native: entity_text → Arrow-batched pandas UDF, so
    embedding runs partition-parallel (the reference loops batches in
    one process). With no codec/API in this container, the default
    provider is the deterministic fake."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from ..operators.fts import entity_text

    fn = embed_fn or fake_embedding

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
