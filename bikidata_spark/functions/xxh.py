"""Driver-side XXH64, bit-compatible with Spark's ``xxhash64``.

The engine's term ids are ``F.xxhash64(value)`` (graph.py:34-36, seed
42). Mutations and the driver-resident point-query tier
(plans/local_tier.py) need those same ids for a handful of NEW terms
per request — paying a Spark job (createDataFrame → select → collect)
per mutation just to hash four short strings is the single scheduler
round-trip left on the serving mutation path. This module computes the
id driver-side instead.

The algorithm is the public XXH64 specification (Yann Collet,
github.com/Cyan4973/xxHash, BSD): Spark's
``sql/catalyst/expressions/XXH64.java`` implements the same spec over
the UTF-8 bytes of the string with little-endian word reads, so a
spec-faithful Python implementation is bit-identical. Compatibility is
not assumed — tests/test_xxh.py fuzzes random unicode strings against
the JVM result (hypothesis + a batched Spark probe).

Pure Python over ``int`` with explicit 2^64 masking; short-string cost
is ~3 µs, and mutation batches are request-sized, so no numpy
vectorization is warranted.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

_M = (1 << 64) - 1

_SPARK_SEED = 42  # XxHash64 expression default seed


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, k: int) -> int:
    acc = (acc + k * _P2) & _M
    acc = _rotl(acc, 31)
    return (acc * _P1) & _M


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = _SPARK_SEED) -> int:
    """XXH64 of ``data`` — unsigned 64-bit result."""
    n = len(data)
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        i = 0
        lim = n - 32
        u = struct.unpack_from
        while i <= lim:
            k1, k2, k3, k4 = u("<QQQQ", data, i)
            v1 = _round(v1, k1)
            v2 = _round(v2, k2)
            v3 = _round(v3, k3)
            v4 = _round(v4, k4)
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M
        i = 0
    h = (h + n) & _M
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h ^= _round(0, k)
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h ^= (k * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    # avalanche
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def term_id(value: str) -> int:
    """Signed 64-bit dictionary code of a term — bit-identical to the
    engine's ``term_hash`` column (``F.xxhash64(value)``, seed 42) so
    driver-side code can mint ids that join against the stored graph."""
    h = xxh64(value.encode("utf-8"))
    return h - (1 << 64) if h >= 1 << 63 else h
