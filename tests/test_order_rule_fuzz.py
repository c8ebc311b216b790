"""Property-based fuzz of the sort-api ORDER RULE space on a synthetic
multilingual graph, against a DuckDB oracle.

The driver's testdata labels carry no language tags, so the
language-preference rank — the first field of the min-struct that
picks each subject's best label (plans/query.py::_order_key_frame) —
is constant there and the general opts fuzz cannot catch rank bugs.
This module builds a graph whose subjects have 0-4 labels across
languages (with deliberate ties, numeric prefixes, and shared texts)
and fuzzes {langs × dir × nulls × natural × mode} against a SQL
mirror of the reference's preference semantics (reference
query.py:245-316): per-lang rank whens, no-tag rank len+1, other-tag
rank len+2, best label = rank-1 by (rank asc, label asc), page order =
nulls rule, optional numeric-prefix natural order, label, subject
tiebreak.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bikidata_spark import Engine, from_string_quads
from bikidata_spark.sources.rdfize import RDFS_LABEL

TEXTS = ["alpha", "Beta", "42 beta", "7 alpha", "alpha", "Émile", "10 zulu", "zulu"]
LANGS = [None, "en", "de", "fr"]

# (subject_index, text, lang) label rows — fixed, adversarial: shared
# texts force ties, several subjects share their best label, some have
# no label at all (null ordering), numeric prefixes exercise natural
# order, one accented text exercises the lex/raw split
LABEL_ROWS = []
_k = 0
for i in range(14):
    n_labels = (i * 7) % 5  # 0..4 labels; i=0 and i=7 get 0 → null path
    for j in range(n_labels):
        LABEL_ROWS.append((i, TEXTS[(_k * 3) % len(TEXTS)], LANGS[(_k * 5) % len(LANGS)]))
        _k += 1


def _quad_rows():
    rows = []
    for i, text, lang in LABEL_ROWS:
        lit = f'"{text}"@{lang}' if lang else f'"{text}"'
        rows.append((f"<e/x{i}>", RDFS_LABEL, lit, ""))
    for i in range(14):  # every subject exists via a type triple
        rows.append((f"<e/x{i}>", "<p/type>", "<c/thing>", ""))
    return rows


@pytest.fixture(scope="module")
def order_engine(spark):
    quads = spark.createDataFrame(_quad_rows(), "s string, p string, o string, g string")
    g = from_string_quads(quads).cache()
    g.triples.count()
    return Engine(g)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE labels (s VARCHAR, text VARCHAR, lang VARCHAR)"
    )
    con.executemany(
        "INSERT INTO labels VALUES (?, ?, ?)",
        [(f"<e/x{i}>", t, lang) for i, t, lang in LABEL_ROWS],
    )
    con.execute(
        "CREATE TABLE subjects AS SELECT DISTINCT '<e/x' || CAST(r AS VARCHAR) || '>' AS s "
        "FROM range(14) t(r)"
    )
    yield con
    con.close()


def _rank_sql(langs: list[str]) -> str:
    whens = " ".join(
        f"WHEN lang = '{lg}' THEN {r + 1}" for r, lg in enumerate(langs)
    )
    return f"CASE {whens} WHEN lang IS NULL THEN {len(langs) + 1} ELSE {len(langs) + 2} END"


@st.composite
def order_rules(draw):
    langs = draw(st.sampled_from([["de", "en"], ["en"], ["fr", "de"], ["en", "de", "fr"]]))
    direction = draw(st.sampled_from(["asc", "desc"]))
    nulls = draw(st.sampled_from(["last", "first"]))
    natural = draw(st.booleans())
    mode = draw(st.sampled_from(["lex", "raw"]))
    return {"by": "label", "lang": langs, "dir": direction, "nulls": nulls,
            "natural": natural, "mode": mode}


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(rule=order_rules())
def test_fuzz_order_rules(order_engine, duck, rule):
    opts = {
        "filters": [{"p": "<p/type>", "o": "<c/thing>"}],
        "order": [rule],
        "size": 14,
        "use_cache": False,
    }
    got = [r["s_value"] for r in order_engine.page(opts).orderBy("pos").collect()]

    label_expr = "trim(regexp_extract(text, '^(.+)$', 1))"
    if rule["mode"] == "lex":
        label_expr = f"lower({label_expr})"
    d = rule["dir"].upper()
    null_key = "(sort_label IS NULL)"
    if rule["nulls"] == "first":
        null_key = "NOT (sort_label IS NULL)"
    nat = ""
    if rule["natural"]:
        nat = (
            "(TRY_CAST(regexp_extract(sort_label, '^(\\d+)', 1) AS BIGINT) IS NULL) ASC, "
            f"TRY_CAST(regexp_extract(sort_label, '^(\\d+)', 1) AS BIGINT) {d}, "
        )
    sql = f"""
WITH ranked AS (
  SELECT s, {_rank_sql(rule["lang"])} AS lang_rank, {label_expr} AS sort_label
  FROM labels
),
pref AS (
  SELECT s, sort_label FROM (
    SELECT s, sort_label,
           row_number() OVER (PARTITION BY s ORDER BY lang_rank ASC, sort_label ASC) AS rn
    FROM ranked
  ) WHERE rn = 1
)
SELECT S.s FROM subjects S LEFT JOIN pref P ON P.s = S.s
ORDER BY {null_key} ASC, {nat} sort_label {d}, S.s ASC
"""
    want = [r[0] for r in duck.execute(sql).fetchall()]
    assert got == want, (rule, got, want)
