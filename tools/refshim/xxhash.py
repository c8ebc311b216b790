"""Minimal stand-in for the C-extension ``xxhash`` package, backed by
the system ``libxxhash.so`` via ctypes.

Purpose: the reference engine (reference query.py:3, main.py:3) needs
``xxhash.xxh64_hexdigest`` / ``xxh64_intdigest``; the package is not
installed in this container but the native library is. A ctypes call
is ~2 us vs ~0.2 us for the real binding — the gap is measured by
``per_call_overhead_s()`` so the baseline report can quantify how much
the shim inflates the reference's hash-heavy build loop.

Falls back to a pure-Python XXH64 (public algorithm, see
https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md) when
no native library is present, so the shim works anywhere.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import time

_lib = None
for _name in ("libxxhash.so.0", "libxxhash.so", ctypes.util.find_library("xxhash")):
    if not _name:
        continue
    try:
        _lib = ctypes.CDLL(_name)
        _lib.XXH64.restype = ctypes.c_uint64
        _lib.XXH64.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_uint64]
        break
    except OSError:
        _lib = None

# ---- pure-Python fallback (XXH64 spec constants) -----------------------
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _M


def _xxh64_py(data: bytes, seed: int = 0) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        acc = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        acc = _merge(acc, v1)
        acc = _merge(acc, v2)
        acc = _merge(acc, v3)
        acc = _merge(acc, v4)
    else:
        acc = (seed + _P5) & _M
    acc = (acc + n) & _M
    while i <= n - 8:
        acc ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        acc = (_rotl(acc, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        acc ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        acc = (_rotl(acc, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        acc ^= (data[i] * _P5) & _M
        acc = (_rotl(acc, 11) * _P1) & _M
        i += 1
    acc ^= acc >> 33
    acc = (acc * _P2) & _M
    acc ^= acc >> 29
    acc = (acc * _P3) & _M
    acc ^= acc >> 32
    return acc


def _digest_int(data, seed: int = 0) -> int:
    if isinstance(data, str):
        data = data.encode("utf-8")
    if _lib is not None:
        return _lib.XXH64(data, len(data), seed)
    return _xxh64_py(data, seed)


def xxh64_intdigest(data, seed: int = 0) -> int:
    return _digest_int(data, seed)


def xxh64_hexdigest(data, seed: int = 0) -> str:
    return format(_digest_int(data, seed), "016x")


class xxh64:
    """Streaming-object facade (concatenates updates; fine for the
    short strings the reference hashes)."""

    def __init__(self, data=b"", seed: int = 0):
        self._buf = bytearray()
        self._seed = seed
        if data:
            self.update(data)

    def update(self, data):
        if isinstance(data, str):
            data = data.encode("utf-8")
        self._buf.extend(data)

    def intdigest(self) -> int:
        return _digest_int(bytes(self._buf), self._seed)

    def hexdigest(self) -> str:
        return format(self.intdigest(), "016x")

    def digest(self) -> bytes:
        return self.intdigest().to_bytes(8, "big")


def backend() -> str:
    return "ctypes:libxxhash" if _lib is not None else "pure-python"


def per_call_overhead_s(n: int = 200_000) -> float:
    """Median-of-3 per-call wall cost of ``xxh64_hexdigest`` on a
    typical short IRI, for correcting build-time comparisons."""
    probe = "<http://example.org/entity/customer/123456>"
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            xxh64_hexdigest(probe)
        runs.append((time.perf_counter() - t0) / n)
    runs.sort()
    return runs[1]
