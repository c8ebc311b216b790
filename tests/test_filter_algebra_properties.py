"""Property-based checks of the filter-algebra contract
(reference query.py:629-669): hypothesis generates random filter
stacks and the engine's set algebra must satisfy the reference's
documented laws on a small in-memory graph."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bikidata_spark import Engine, build_from_iterator

# tiny graph: 12 subjects, 3 properties with overlapping value sets
_QUADS = []
for i in range(12):
    _QUADS.append((f"<e/{i}>", "<p/mod2>", f'"{i % 2}"'))
    _QUADS.append((f"<e/{i}>", "<p/mod3>", f'"{i % 3}"'))
    if i % 4 == 0:
        _QUADS.append((f"<e/{i}>", "<p/tag>", '"special"'))

_FILTERS = [
    {"p": "<p/mod2>", "o": '"0"'},
    {"p": "<p/mod2>", "o": '"1"'},
    {"p": "<p/mod3>", "o": '"0"'},
    {"p": "<p/mod3>", "o": '"1"'},
    {"p": "<p/tag>", "o": '"special"'},
]


@pytest.fixture(scope="module")
def algebra_engine(spark):
    return Engine(build_from_iterator(spark, _QUADS).cache())


def _eval_python(filters) -> set[str]:
    """Reference-semantics oracle in plain Python sets."""
    subs = {}
    for f in _FILTERS:
        key = (f["p"], f["o"])
        members = set()
        for i in range(12):
            if f["p"] == "<p/mod2>" and f'"{i % 2}"' == f["o"]:
                members.add(f"<e/{i}>")
            if f["p"] == "<p/mod3>" and f'"{i % 3}"' == f["o"]:
                members.add(f"<e/{i}>")
            if f["p"] == "<p/tag>" and f["o"] == '"special"' and i % 4 == 0:
                members.add(f"<e/{i}>")
        subs[key] = members

    # SQL set-op precedence, as the reference's concatenated SQL
    # evaluates in DuckDB: INTERSECT binds tighter than UNION, so a run
    # of consecutive `must` filters intersects into the preceding term
    # and the groups union; EXCEPT clauses still apply last.
    groups: list[list[set]] = []
    excepts = []
    for f in filters:
        s = subs[(f["p"], f["o"])]
        op = f.get("op", "should")
        if not groups:
            groups.append([set(s)])
        elif op in ("must", "and"):
            groups[-1].append(s)
        elif op == "not":
            excepts.append(s)
        else:
            groups.append([set(s)])
    if not groups:
        return set()
    from functools import reduce

    combined = set()
    for g in groups:
        combined |= reduce(lambda a, b: a & b, g)
    for e in excepts:
        combined = combined - e
    return combined


@st.composite
def filter_stacks(draw):
    n = draw(st.integers(min_value=1, max_value=4))
    stack = []
    for i in range(n):
        f = dict(draw(st.sampled_from(_FILTERS)))
        if i > 0:
            f["op"] = draw(st.sampled_from(["should", "must", "not"]))
        stack.append(f)
    return stack


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(stack=filter_stacks())
def test_algebra_matches_set_semantics(algebra_engine, stack):
    got = {
        r["s"]
        for r in algebra_engine.subjects_values(
            {"filters": stack, "use_cache": False}
        ).collect()
    }
    assert got == _eval_python(stack), stack


@settings(max_examples=6, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(stack=filter_stacks())
def test_not_filters_are_position_independent(algebra_engine, stack):
    """The reference forces EXCEPT clauses last regardless of where the
    user wrote them (query.py:631-633, 668): moving every `not` filter
    to the end must not change the result."""
    nots = [f for f in stack if f.get("op") == "not"]
    rest = [f for f in stack if f.get("op") != "not"]
    if not nots or not rest:
        return
    reordered = rest + nots
    a = {
        r["s"]
        for r in algebra_engine.subjects_values({"filters": stack, "use_cache": False}).collect()
    }
    b = {
        r["s"]
        for r in algebra_engine.subjects_values(
            {"filters": reordered, "use_cache": False}
        ).collect()
    }
    assert a == b, (stack, reordered)
