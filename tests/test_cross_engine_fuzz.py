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

from bikidata_spark.functions.porter import porter_stem, porter_subquery, stem_tokens_df
from bikidata_spark.operators.fts import (
    strip_accents_py,
    strip_accents_sql,
    tokenize_query,
    tokens_col,
)

SEED = 20260813


def _random_tokens(n: int) -> list[str]:
    rng = random.Random(SEED)
    alpha = string.ascii_lowercase + string.digits
    out = []
    for _ in range(n):
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 10)))
        # bias toward suffixes every porter step reacts to
        w += rng.choice(
            ["", "s", "ss", "es", "ies", "sses", "eed", "ed", "ing", "y",
             "ational", "tional", "izer", "alli", "ization", "iveness",
             "icate", "ative", "ness", "ement", "ment", "ent", "ion",
             "able", "ance", "al", "er", "e", "ll"]
        )
        out.append(w)
    return out


PAPER_VECTORS = {
    # full-pipeline outputs of the 1980 algorithm
    "caresses": "caress", "flies": "fli", "dies": "di", "mules": "mule",
    "denied": "deni", "died": "di", "agreed": "agre", "owned": "own",
    "humbled": "humbl", "sized": "size", "meeting": "meet", "stating": "state",
    "itemization": "item", "sensational": "sensat", "traditional": "tradit",
    "reference": "refer", "colonizer": "colon", "plotted": "plot",
    "revival": "reviv", "hopping": "hop", "happy": "happi", "sky": "sky",
    "relational": "relat", "electrical": "electr", "controll": "control",
    "roll": "roll", "customers": "custom", "rate": "rate", "cease": "ceas",
    "feed": "feed", "bled": "bled", "sing": "sing",
}


def test_porter_paper_vectors():
    got = {w: porter_stem(w) for w in PAPER_VECTORS}
    assert got == PAPER_VECTORS


def test_porter_three_way(spark):
    toks = sorted(set(_random_tokens(400)) | set(PAPER_VECTORS) | {
        "syzygy", "yyy", "vyy", "gypsy", "toy", "enjoyed", "dying", "lying",
        "agree", "trees", "ivy", "argued", "000000013", "a1b", "by", "a",
    })
    py = [porter_stem(t) for t in toks]
    sdf = spark.createDataFrame(list(enumerate(toks)), "i long, t string")
    sp = [r["t"] for r in stem_tokens_df(sdf, "t").orderBy("i").collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE toks(i BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO toks VALUES (?, ?)", list(enumerate(toks)))
    sub = porter_subquery("SELECT i, t FROM toks", ["i"])
    dk = [r[1] for r in con.execute(f"SELECT i, t FROM ({sub}) ORDER BY i").fetchall()]
    assert py == sp == dk


def test_tokenizer_three_way(spark):
    """Tokenizer with accent stripping: Python twin == Spark == DuckDB."""
    rng = random.Random(SEED + 1)
    accents = "äöüéèñçĀŠžø"
    texts = [
        "".join(rng.choice(string.printable[:70] + accents) for _ in range(rng.randint(0, 60)))
        for _ in range(200)
    ] + [
        "Zürich café ñandú",
        "ŻABA żaba",
        "naïve Noël",
        # hostile case-mapping inputs: the incremental FTS path
        # (FtsIndex.with_new_literals) tokenizes INDEX documents with
        # the Python tokenizer, so lower/translate must agree with the
        # JVM on these too (Turkish İ, ß/ẞ, ligatures, combining marks)
        "İstanbul STRASSE ß ẞ ﬁle ﬂow",
        "i̇ İ İı",
        "ǅungla ǱǲǳǄǆ",
        "ﬀoo ﬃx ﬆop",
        "Σίσυφος ΣΙΣΥΦΟΣ σ ς",
    ]
    py = [tokenize_query(t, strip_accents=True) for t in texts]
    sdf = spark.createDataFrame([(t,) for t in texts], "t string")
    sp = [r["o"] for r in sdf.select(tokens_col(F.col("t"), strip_accents=True).alias("o")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE txts(t VARCHAR)")
    con.executemany("INSERT INTO txts VALUES (?)", [(t,) for t in texts])
    dk = [
        r[0]
        for r in con.execute(
            f"SELECT list_filter(string_split_regex({strip_accents_sql('lower(t)')}, '[^a-z0-9]+'), x -> x != '') FROM txts"
        ).fetchall()
    ]
    # the ENGINE contract is py == sp on everything (the incremental
    # FTS path tokenizes index documents in Python, the build in the
    # JVM); both lower İ (U+0130) to 'i' + combining dot. DuckDB's
    # utf8proc lowers it to a bare 'i' — an oracle-side quirk, so the
    # DuckDB leg skips İ-bearing inputs.
    assert py == sp
    no_i = [i for i, t in enumerate(texts) if "İ" not in t]
    assert [py[i] for i in no_i] == [dk[i] for i in no_i]


def test_strip_accents_map():
    assert strip_accents_py("zürich-é-ŝ") == "zurich-e-s"
    # unmapped chars pass through untouched (they remain separators)
    assert strip_accents_py("straße œuf") == "straße œuf"


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


def _nq_reference_parse(line: str):
    """Python reference of the N-Quads token-shape rule (r6): a
    statement has a graph iff ≥4 tokens and the last token is an IRI
    (<...>) or a quote-free blank-node label (_:...). Mirrors the
    reference's NT split-on-single-space semantics otherwise."""
    t = line.strip()
    if not t.endswith(" ."):
        return None
    arr = t[:-2].rstrip().split(" ")
    if len(arr) < 3:
        return None
    last = arr[-1]
    has_g = len(arr) >= 4 and (
        (last.startswith("<") and last.endswith(">"))
        or (last.startswith("_:") and '"' not in last)
    )
    if has_g:
        s, p, o, g = arr[0], arr[1], " ".join(arr[2:-1]), last
    else:
        s, p, o, g = arr[0], arr[1], " ".join(arr[2:]), ""
    s_ok = (s.startswith("<") and s.endswith(">")) or s.startswith("_:")
    if not (s_ok and p.startswith("<") and p.endswith(">") and o):
        return None
    return (s, p, o, g)


def test_nq_graph_detection_fuzz(spark):
    """parse_nq_lines vs the Python reference rule on adversarial
    generated lines: literals ending in IRI-shaped, blank-node-shaped,
    datatyped, and langtagged tokens; real graph labels; malformed
    lines; extra spaces."""
    from bikidata_spark.sources.ntriples import parse_nq_lines

    rng = random.Random(SEED + 7)
    subjects = ["<http://ex/s>", "_:b0", "bad", "<open"]
    preds = ["<http://p/x>", "nopred"]
    objects = [
        '"plain"', '"two words"', '"foo _:bar"', '"x _:y"^^<http://t>',
        '"ends <http://iri>"', '"a b"@en', "<http://obj>", "_:oblank",
        '"tail _:z"@de', '""',
    ]
    graphs = ["", "<http://g/1>", "_:glabel", '"notagraph"']
    lines = []
    for _ in range(400):
        s = rng.choice(subjects)
        p = rng.choice(preds)
        o = rng.choice(objects)
        g = rng.choice(graphs)
        parts = [s, p, o] + ([g] if g else [])
        term = rng.choice([" .", " .", " .", ".", ""])  # some malformed
        lines.append(" ".join(parts) + term)
    expected = sorted(r for r in (_nq_reference_parse(ln) for ln in lines) if r)
    got = sorted(
        (r["s"], r["p"], r["o"], r["g"])
        for r in parse_nq_lines(
            spark.createDataFrame([(ln,) for ln in lines], "value string")
        ).collect()
    )
    assert got == expected
