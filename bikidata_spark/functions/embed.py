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
