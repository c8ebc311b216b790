"""Embedding provider seam.

The reference calls a hosted embedding API (reference semantic.py:15-38,
Cohere embed-v4.0, dim 1024). The full production stack exists here:
``HttpEmbeddingClient`` (stdlib urllib, Cohere-v2 request/response
shape) → ``BatchedProvider`` (96-batching, retry, pacing) →
``build_semantic`` (Arrow-batched pandas UDF). The transport is
integration-tested against an in-process localhost HTTP server; only a
hosted endpoint + API key are absent from this container. For offline
runs, ``fake_embedding`` is a deterministic md5-seeded pseudo-embedding
that keeps every downstream code path (vector literals, broadcast,
cosine math) real and testable.
"""

from __future__ import annotations

import hashlib
import json
import logging
import math
import time
import urllib.error
import urllib.parse
import urllib.request

log = logging.getLogger(__name__)


class NonRetryableEmbeddingError(Exception):
    """A request the endpoint deterministically rejects (4xx other than
    429: bad API key, oversize payload, malformed body). Retrying can
    never succeed, so :class:`BatchedProvider` re-raises immediately
    instead of burning its exponential backoff budget."""


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
            except NonRetryableEmbeddingError:
                raise
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


class HttpEmbeddingClient:
    """Stdlib HTTP transport for a hosted batch-embedding endpoint,
    mirroring the reference's Cohere v2 contract (reference
    semantic.py:28-38: POST model/texts/input_type/output_dimension,
    read ``embeddings.float``). Usable as ``BatchedProvider``'s
    ``call``::

        client = HttpEmbeddingClient(url, api_key=key, dim=1024)
        provider = BatchedProvider(client, batch_size=96)

    Pure ``urllib`` — no third-party SDK, so it works anywhere Python
    does; executor-local like the provider (holds no connection state,
    each call is an independent request). ``response_path`` walks the
    reply JSON to the list-of-vectors, defaulting to the Cohere shape
    ``("embeddings", "float")``; pass e.g. ``("data",)`` for
    OpenAI-style replies whose items are ``{"embedding": [...]}``
    (dicts with an ``embedding`` key are unwrapped per item).

    Raising on HTTP/shape errors is deliberate: ``BatchedProvider``
    owns retry/backoff/pacing, the transport stays dumb."""

    def __init__(
        self,
        url: str,
        api_key: str | None = None,
        model: str = "embed-v4.0",
        input_type: str = "search_document",
        dim: int | None = 1024,
        timeout_s: float = 30.0,
        extra_payload: dict | None = None,
        response_path: tuple = ("embeddings", "float"),
        opener=None,
        max_tokens: int | None | str = "auto",
        truncate: str | None = "auto",
    ):
        self.url = url
        self.api_key = api_key
        self.model = model
        self.input_type = input_type
        self.dim = dim
        self.timeout_s = timeout_s
        self.extra_payload = extra_payload or {}
        self.response_path = tuple(response_path)
        self._open = opener or urllib.request.urlopen
        # Cohere parity (reference semantic.py:28-38 sends both): texts
        # past the model's limit are truncated server-side instead of
        # 400-ing the whole batch. "auto" sends them ONLY on the Cohere
        # reply shape — an OpenAI-shape endpoint (custom response_path)
        # would 400 on the unknown fields. Pass explicit values (or
        # None) to override either way.
        cohere_shape = self.response_path == ("embeddings", "float")
        self.max_tokens = (8000 if cohere_shape else None) if max_tokens == "auto" else max_tokens
        self.truncate = ("END" if cohere_shape else None) if truncate == "auto" else truncate
        scheme = urllib.parse.urlsplit(url).scheme.lower()
        host = (urllib.parse.urlsplit(url).hostname or "").lower()
        if api_key and scheme != "https" and host not in ("localhost", "127.0.0.1", "::1"):
            log.warning(
                "embedding API key will be sent over non-TLS url %s — "
                "use https:// (plain http is only safe for localhost tests)",
                url,
            )

    def __call__(self, texts: list[str]) -> list[list[float]]:
        payload: dict = {
            "model": self.model,
            "texts": list(texts),
            "input_type": self.input_type,
            "embedding_types": ["float"],
            **self.extra_payload,
        }
        if self.dim is not None:
            payload["output_dimension"] = self.dim
        if self.max_tokens is not None:
            payload.setdefault("max_tokens", self.max_tokens)
        if self.truncate is not None:
            payload.setdefault("truncate", self.truncate)
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        req = urllib.request.Request(
            self.url, data=json.dumps(payload).encode("utf-8"), headers=headers
        )
        try:
            with self._open(req, timeout=self.timeout_s) as resp:
                body = json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as e:
            # 408 (request timeout) and 429 (throttle) are transient —
            # leave them to BatchedProvider's retry/backoff budget
            if 400 <= e.code < 500 and e.code not in (408, 429):
                raise NonRetryableEmbeddingError(
                    f"endpoint rejected request ({e.code} {e.reason})"
                ) from e
            raise
        node = body
        for key in self.response_path:
            node = node[key]
        vecs = [v["embedding"] if isinstance(v, dict) else v for v in node]
        if self.dim is not None:
            for v in vecs:
                if len(v) != self.dim:
                    raise ValueError(
                        f"endpoint returned dim={len(v)}, expected {self.dim}"
                    )
        return [[float(x) for x in v] for v in vecs]


# Executor-side provider cache: one provider instance per (Python
# worker process, build_semantic call). The module stays imported in
# reused workers, so connections/pacing state survive across tasks
# instead of being rebuilt per Arrow batch. Bounded: a long-lived
# worker serving many build_semantic calls must not accumulate one
# provider (connections, auth state) per historical job.
_WORKER_PROVIDERS: dict = {}
_WORKER_PROVIDERS_MAX = 4


def _worker_provider(token: str, factory):
    prov = _WORKER_PROVIDERS.get(token)
    if prov is None:
        while len(_WORKER_PROVIDERS) >= _WORKER_PROVIDERS_MAX:
            stale = _WORKER_PROVIDERS.pop(next(iter(_WORKER_PROVIDERS)))
            close = getattr(stale, "close", None)
            if callable(close):
                try:
                    close()
                except Exception:
                    pass
        prov = _WORKER_PROVIDERS[token] = factory()
    return prov


def build_semantic(
    graph, dim: int = 64, hops: int = 2, embed_fn=None, provider=None, provider_factory=None
):
    """Build the per-subject embedding table (s, vec) from entity text
    (reference semantic.py:41-87: embeds the ``fts`` table rows in
    batches). Spark-native: entity_text → Arrow-batched pandas UDF, so
    embedding runs partition-parallel (the reference loops batches in
    one process). Pass ``provider`` (a :class:`BatchedProvider`) to hit
    a real batch endpoint with retry/pacing; with no codec/API in this
    container, the default is the deterministic fake.

    ``provider_factory`` is the production variant of ``provider``: a
    zero-arg callable run ON THE EXECUTOR (cached per Python worker) to
    build the provider there — connections, auth state, and pacing
    clocks then live worker-local instead of being pickled from the
    driver, and 1000 executors each pace their own request stream. The
    driver never constructs a client."""
    from pyspark.sql.functions import pandas_udf

    from ..operators.fts import entity_text

    fn = embed_fn or fake_embedding

    if provider_factory is not None:
        import uuid

        token = uuid.uuid4().hex  # pickled by value into every task

        @pandas_udf("array<double>")
        def embed(texts):
            import pandas as pd

            prov = _worker_provider(token, provider_factory)
            vecs = prov.embed_many([t or "" for t in texts])
            return pd.Series(vecs)

    elif provider is not None:

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
