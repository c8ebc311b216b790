"""Driver-side XXH64 must be bit-identical to Spark's ``xxhash64``.

The whole incremental-mutation path (Engine.mutate patching the local
tier, plans/local_tier.py) rests on ``functions.xxh.term_id`` minting
the SAME 64-bit ids as the JVM ``F.xxhash64`` column that built the
stored graph (graph.py:34-36). These tests pin that contract: published
spec vectors, then a randomized differential run against the live JVM.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from bikidata_spark.functions.xxh import term_id, xxh64

# spec vectors from the public XXH64 reference (github.com/Cyan4973/xxHash)
_SPEC = [
    (b"", 0, 0xEF46DB3751D8E999),
    (b"a", 0, 0xD24EC4F1A98C6E5B),
    (b"abc", 0, 0x44BC2CF5AD770999),
    (b"The quick brown fox jumps over the lazy dog", 0, 0x0B242D361FDA71BC),
]


def test_spec_vectors():
    for data, seed, want in _SPEC:
        assert xxh64(data, seed) == want


def _hostile_strings() -> list[str]:
    rng = random.Random(0xB1C1)
    alphabet = (
        "abcXYZ<>\"_:0129 \t\néßŁ中文"
        "\U0001F600​﻿'%\\/.#@"
    )
    out = [
        "",
        " ",
        '"lit"@en',
        "<http://example.org/thing#f>",
        "_:b0",
        "a" * 7,
        "a" * 8,
        "a" * 31,
        "a" * 32,
        "a" * 33,
        "é" * 16,  # multi-byte chars crossing the 32-byte stripe
        "\U0001F600" * 9,  # 4-byte chars
    ]
    for _ in range(300):
        n = rng.randint(1, 80)
        out.append("".join(rng.choice(alphabet) for _ in range(n)))
    return out


def test_matches_spark_xxhash64(spark):
    """term_id(s) == F.xxhash64(s) for hostile + random strings, checked
    in ONE batched job (each length class exercises a different tail
    path of the word loop)."""
    strings = _hostile_strings()
    df = spark.createDataFrame([(s,) for s in strings], "value string")
    got = {
        r["value"]: r["h"]
        for r in df.select("value", F.xxhash64("value").alias("h")).collect()
    }
    bad = [s for s in strings if term_id(s) != got[s]]
    assert not bad, f"{len(bad)} mismatches, first: {bad[0]!r}"
