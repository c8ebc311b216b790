"""Three-way fuzz: the 'same rule in Spark, Python and DuckDB' contract
(SURVEY.md §6) checked on randomized inputs — tokenizer, stemmer, and
literal_to_parts must agree bit-for-bit across engines, because oracle
comparisons silently depend on it."""

from __future__ import annotations

import random
import string

import duckdb
import pytest
from pyspark.sql import functions as F

from bikidata_spark.operators.fts import stem_sql, stem_token, tokenize_query, tokens_col

SEED = 20260813


def _random_tokens(n: int) -> list[str]:
    rng = random.Random(SEED)
    alpha = string.ascii_lowercase + string.digits
    out = []
    for _ in range(n):
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 10)))
        # bias toward interesting suffixes
        w += rng.choice(["", "s", "ss", "es", "ies", "sses", ""])
        out.append(w)
    return out


def test_stemmer_three_way(spark):
    toks = _random_tokens(500)
    py = [stem_token(t) for t in toks]
    sdf = spark.createDataFrame([(t,) for t in toks], "t string")
    from bikidata_spark.operators.fts import _stem_col

    sp = [r["o"] for r in sdf.select(_stem_col(F.col("t")).alias("o")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE toks(t VARCHAR)")
    con.executemany("INSERT INTO toks VALUES (?)", [(t,) for t in toks])
    dk = [r[0] for r in con.execute(f"SELECT {stem_sql('t')} FROM toks").fetchall()]
    assert py == sp == dk


def test_tokenizer_three_way(spark):
    rng = random.Random(SEED + 1)
    texts = [
        "".join(rng.choice(string.printable[:70] + "äöü") for _ in range(rng.randint(0, 60)))
        for _ in range(200)
    ]
    py = [tokenize_query(t) for t in texts]
    sdf = spark.createDataFrame([(t,) for t in texts], "t string")
    sp = [r["o"] for r in sdf.select(tokens_col(F.col("t")).alias("o")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE txts(t VARCHAR)")
    con.executemany("INSERT INTO txts VALUES (?)", [(t,) for t in texts])
    dk = [
        r[0]
        for r in con.execute(
            "SELECT list_filter(string_split_regex(lower(t), '[^a-z0-9]+'), x -> x != '') FROM txts"
        ).fetchall()
    ]
    assert py == sp == dk


def test_literal_parts_roundtrip(spark):
    from bikidata_spark.sources.ntriples import literal_to_parts_cols

    cases = [
        ('"plain"', "plain", None, None),
        ('"hallo"@de', "hallo", "de", None),
        ('"42"^^<http://www.w3.org/2001/XMLSchema#integer>', "42", None,
         "<http://www.w3.org/2001/XMLSchema#integer>"),
        ("<http://not/a/literal>", None, None, None),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "o string")
    rows = df.select(*literal_to_parts_cols(F.col("o"))).collect()
    got = [(r["literal_value"], r["language"], r["datatype"]) for r in rows]
    assert got == [(v, l, d) for _, v, l, d in cases]


def test_hash_split_bucket_three_way(spark):
    """The md5-permille bucket (hash_split / sample_mixture) must agree
    across Python, Spark and DuckDB on arbitrary ids."""
    import hashlib

    rng = random.Random(SEED + 2)
    ids = [rng.randint(0, 10**12) for _ in range(300)]
    py = [int(hashlib.md5(f"split:{i}".encode()).hexdigest()[:8], 16) % 1000 for i in ids]
    sdf = spark.createDataFrame([(i,) for i in ids], "id long")
    sp = [
        r["b"]
        for r in sdf.select(
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit("split:"), F.col("id").cast("string"))), 1, 8),
                    16,
                    10,
                ).cast("long")
                % 1000
            ).alias("b")
        ).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE ids(id BIGINT)")
    con.executemany("INSERT INTO ids VALUES (?)", [(i,) for i in ids])
    dk = [
        r[0]
        for r in con.execute(
            "SELECT CAST(CAST(('0x' || substr(md5('split:' || CAST(id AS VARCHAR)), 1, 8)) AS UBIGINT) AS BIGINT) % 1000 FROM ids"
        ).fetchall()
    ]
    assert py == sp == dk


def test_chunking_three_way(spark):
    """Chunk boundaries and texts must agree between Spark and DuckDB
    for arbitrary token counts around the chunk-width edges."""
    from bikidata_spark.functions.text import chunk_documents

    rng = random.Random(SEED + 3)
    rows = []
    for i in range(60):
        n = rng.choice([0, 1, 7, 8, 9, 15, 16, 17, rng.randint(0, 40)])
        rows.append((i, " ".join(f"w{rng.randint(0,9)}" for _ in range(n))))
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    sp = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(sdf, "doc_id", "text", chunk_tokens=8).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    dk = sorted(
        tuple(r)
        for r in con.execute(
            """
WITH toklist AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '') AS ts FROM documents),
ch AS (SELECT doc_id, ts, unnest(range((len(ts) + 7) // 8)) AS ci FROM toklist WHERE len(ts) > 0)
SELECT doc_id, CAST(ci AS BIGINT), array_to_string(ts[ci*8+1 : ci*8+8], ' '), CAST(least(8, len(ts) - ci*8) AS BIGINT) FROM ch
"""
        ).fetchall()
    )
    assert sp == dk
