"""Property-based fuzz of the FULL ``query(opts)`` surface against a
DuckDB oracle (VERDICT r2 #10): hypothesis draws random filter chains
(property/object/id/graph/multi-object/hop/regex/fts) with
should/must/not ops, plus order + paging, at sf0.001; each draw is
compiled to the same concatenated UNION/INTERSECT/EXCEPT SQL the
reference emits (query.py:629-669) and DuckDB's own set-op precedence
is the ground truth — exactly the contract the per-query oracles in
``__spark_entry__.py`` pin, but over the whole opts space instead of
hand-picked points."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import os

from bikidata_spark.operators.fts import strip_accents_sql, tokenize_query
from bikidata_spark.sources.rdfize import RDFS_LABEL, rdfize_sql

SF_DIR = os.environ.get("BIKIDATA_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _fts_where(text: str) -> str:
    terms = tokenize_query(text, strip_accents=True)
    arr = "[" + ", ".join(f"'{t}'" for t in terms) + "]"
    toks = f"string_split_regex({strip_accents_sql('lower(o)')}, '[^a-z0-9]+')"
    return (
        f"o LIKE '\"%' AND len(list_filter({arr}, "
        f"t -> NOT list_contains({toks}, t))) = 0"
    )


def _subj(where: str) -> str:
    return f"SELECT DISTINCT s FROM quads WHERE {where}"


# (filter dict, subject-set SQL over the quads CTE, carries_score)
POOL = [
    ({"p": "<p/mktsegment>", "o": '"BUILDING"'}, _subj("p = '<p/mktsegment>' AND o = '\"BUILDING\"'"), False),
    ({"p": "<p/mktsegment>", "o": '"AUTOMOBILE"'}, _subj("p = '<p/mktsegment>' AND o = '\"AUTOMOBILE\"'"), False),
    ({"p": "<p/type>", "o": "<c/customer>"}, _subj("p = '<p/type>' AND o = '<c/customer>'"), False),
    ({"p": "<p/type>", "o": "<c/supplier>"}, _subj("p = '<p/type>' AND o = '<c/supplier>'"), False),
    ({"p": "", "o": "<e/nation/5>"}, _subj("o = '<e/nation/5>'"), False),
    (
        {"p": "", "o": "<e/nation/5>", "g": "<g/customer>"},
        _subj("o = '<e/nation/5>' AND g = '<g/customer>'"),
        False,
    ),
    (
        {"p": "<p/nation>", "o": "<e/nation/5> <e/nation/7>"},
        _subj("p = '<p/nation>' AND o IN ('<e/nation/5>', '<e/nation/7>')"),
        False,
    ),
    (
        {"p": "<p/nation> 1", "o": "<e/nation/5>"},
        "SELECT DISTINCT T1.s AS s FROM quads T0 JOIN quads T1 ON T1.o = T0.s "
        "WHERE T0.p = '<p/nation>' AND T0.o = '<e/nation/5>'",
        False,
    ),
    ({"p": "id", "o": "<e/customer/1>"}, _subj("s = '<e/customer/1>'"), False),
    (
        {"p": "regex", "o": '"Customer#0000000.."'},
        _subj("o LIKE '\"%' AND regexp_full_match(o, '\"Customer#0000000..\"')"),
        False,
    ),
    ({"p": "fts", "o": "customer"}, _subj(_fts_where("customer")), True),
    ({"p": "fts", "o": "nation 5"}, _subj(_fts_where("nation 5")), True),
]


def chain_sql(picks: list[tuple[dict, str]]) -> str:
    """Concatenate per-filter subject SQL exactly as the reference does
    (UNION/INTERSECT in listed order, EXCEPT clauses forced last);
    DuckDB's native precedence then IS the expected semantics."""
    body = picks[0][1]
    excepts = []
    for fd, sql in picks[1:]:
        op = fd.get("op", "should")
        if op == "not":
            excepts.append(sql)
        elif op in ("must", "and"):
            body += f"\nINTERSECT\n{sql}"
        else:
            body += f"\nUNION\n{sql}"
    for e in excepts:
        body += f"\nEXCEPT\n{e}"
    return body


@st.composite
def opt_chains(draw, pool):
    n = draw(st.integers(min_value=1, max_value=4))
    picks = []
    for i in range(n):
        fd, sql, _ = draw(st.sampled_from(pool))
        fd = dict(fd)
        if i > 0:
            fd["op"] = draw(st.sampled_from(["should", "must", "not"]))
        picks.append((fd, sql))
    return picks


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _oracle(body: str) -> str:
    """``body`` either starts the main SELECT or continues the WITH
    list with a leading comma."""
    return f"WITH quads AS (\n{rdfize_sql()}\n)\n{body}"


@settings(max_examples=18, deadline=None, suppress_health_check=list(HealthCheck))
@given(picks=opt_chains(POOL))
def test_fuzz_subject_sets(engine, duck, picks):
    opts = {"filters": [fd for fd, _ in picks]}
    got = {r["s"] for r in engine.subjects_values(opts).collect()}
    want = {r[0] for r in duck.execute(_oracle(chain_sql(picks))).fetchall()}
    assert got == want, opts


# score-free pool: with no fts filter present the default page order is
# by subject, which the oracle below mirrors
PAGE_POOL = [entry for entry in POOL if not entry[2]]


@st.composite
def page_opts(draw):
    picks = draw(opt_chains(PAGE_POOL))
    order = draw(st.sampled_from([None, "asc", "desc"]))
    size = draw(st.sampled_from([3, 7, 10]))
    start = draw(st.sampled_from([0, 2, 5]))
    return picks, order, size, start


_LABEL_PREF = f"""
labels AS (
  SELECT S.s, lower(trim(regexp_extract(T.o, '^"(.+)"', 1))) AS sort_label
  FROM s_results S JOIN quads T ON T.s = S.s AND T.p = '{RDFS_LABEL}'
),
pref AS (
  SELECT s, sort_label FROM (
    SELECT s, sort_label, row_number() OVER (PARTITION BY s ORDER BY sort_label) AS rn FROM labels
  ) WHERE rn = 1
)"""


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(drawn=page_opts())
def test_fuzz_order_and_paging(engine, duck, drawn):
    picks, order, size, start = drawn
    opts = {"filters": [fd for fd, _ in picks], "size": size, "start": start}
    if order:
        opts["order"] = [{"by": "label", "dir": order}]
        ob = f"(sort_label IS NULL) ASC, sort_label {order.upper()}, S.s ASC"
        sql = _oracle(
            f""", s_results AS ({chain_sql(picks)}),{_LABEL_PREF},
page AS (
  SELECT S.s, P.sort_label FROM s_results S LEFT JOIN pref P ON P.s = S.s
  ORDER BY {ob} LIMIT {size} OFFSET {start}
)
SELECT CAST(row_number() OVER (ORDER BY {ob.replace('S.s', 's')}) AS INT) AS pos, s FROM page"""
        )
    else:
        sql = _oracle(
            f""", s_results AS ({chain_sql(picks)}),
page AS (SELECT s FROM s_results ORDER BY s LIMIT {size} OFFSET {start})
SELECT CAST(row_number() OVER (ORDER BY s) AS INT) AS pos, s FROM page"""
        )
    got = [
        (r["pos"], r["s"])
        for r in engine.page(opts)
        .selectExpr("cast(pos as int) pos", "s_value as s")
        .collect()
    ]
    got.sort()
    want = sorted((r[0], r[1]) for r in duck.execute(sql).fetchall())
    assert got == want, opts


@st.composite
def facet_opts(draw):
    picks = draw(opt_chains(PAGE_POOL))
    agg = draw(
        st.sampled_from(["<p/nation>", "<p/mktsegment>", "<p/type>", "properties", "graphs"])
    )
    return picks, agg


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(drawn=facet_opts())
def test_fuzz_facets(engine, duck, drawn):
    """Facet counts over random filter chains match DuckDB for value
    facets AND the properties/graphs meta-facets (the aggregates:
    surface of query(opts), previously pinned only at hand-picked
    points)."""
    picks, agg = drawn
    s_results, _ = engine.subjects({"filters": [fd for fd, _ in picks]})
    got = {
        (r["count"], r["val"]) for r in engine.facet(s_results, agg).collect()
    }
    if agg == "properties":
        inner = "SELECT COUNT(*) AS count, T.p AS val FROM quads T JOIN s_results S ON T.s = S.s GROUP BY T.p"
    elif agg == "graphs":
        inner = (
            "SELECT COUNT(*) AS count, T.g AS val FROM quads T JOIN s_results S ON T.s = S.s "
            "WHERE T.g != '' GROUP BY T.g"
        )
    else:
        inner = (
            f"SELECT COUNT(T.s) AS count, T.o AS val FROM quads T JOIN s_results S ON T.s = S.s "
            f"WHERE T.p = '{agg}' GROUP BY T.o"
        )
    want = {
        (r[0], r[1])
        for r in duck.execute(
            _oracle(f", s_results AS ({chain_sql(picks)})\n{inner}")
        ).fetchall()
    }
    assert got == want, (agg, [fd for fd, _ in picks])


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(picks=opt_chains(PAGE_POOL), only=st.booleans())
def test_fuzz_hydration_projection(engine, duck, picks, only):
    """only_properties / exclude_properties over random subject sets:
    the hydrated (s, p, o) triples match DuckDB exactly. size covers
    the whole subject set so page order cannot mask a projection bug."""
    props = ["<p/nation>", "<p/mktsegment>"]
    opts = {"filters": [fd for fd, _ in picks], "size": 100000}
    key = "only_properties" if only else "exclude_properties"
    opts[key] = props
    got = {(r["s"], r["p"], r["o"]) for r in engine.hydrate_df(opts).collect()}
    plist = ", ".join(f"'{p}'" for p in props)
    cond = f"T.p IN ({plist})" if only else f"T.p NOT IN ({plist})"
    sql = _oracle(
        f""", s_results AS ({chain_sql(picks)})
SELECT DISTINCT T.s, T.p, T.o FROM quads T JOIN s_results S ON T.s = S.s WHERE {cond}"""
    )
    want = {(r[0], r[1], r[2]) for r in duck.execute(sql).fetchall()}
    assert got == want, opts
