"""Classic Porter stemmer (Porter 1980, *An algorithm for suffix
stripping*), generated three ways from ONE rule table:

- :func:`porter_stem` — pure-Python twin (query-side terms, fuzz oracle);
- :func:`porter_stages` — a list of SQL expression layers over a token
  column, in either the ``spark`` or ``duckdb`` dialect;
- :func:`stem_tokens_df` — applies the layers to a Spark DataFrame as
  stacked Projects (JVM-side, whole-stage codegen, no Python UDF);
- :func:`porter_subquery` — wraps a DuckDB SELECT in the same layers so
  correctness oracles reproduce the index tokens bit-exactly.

The reference indexes with ``stemmer='porter'`` by default (reference
main.py:217-220); we implement the 1980 paper exactly (steps 1a-5b,
longest-match-wins, *no fallthrough when a matched rule's condition
fails*) rather than binding to an engine-specific snowball build, so
Spark, DuckDB, and Python share one definition — proven identical in
tests/test_cross_engine_fuzz.py.

Layering matters: the steps are applied as *successive* projections
(withColumn / nested subqueries). Composing them into a single
expression would duplicate each step's input expression tree tens of
times per layer — multiplicatively across nine layers — while a layer
boundary keeps every step linear in size. Catalyst keeps the stacked
Projects separate (CollapseProject declines to inline non-cheap exprs
referenced more than once), so the executed plan stays linear too.

Measure/shape machinery (paper §2): a word has form [C](VC)^m[V].  We
compute a c/v pattern with three regexp passes — vowels→``V``, then
``y`` after a non-vowel→``V`` (word-initial y and y-after-vowel stay
consonants), then everything else→``C`` (uppercase markers cannot collide: tokens are lowercase [a-z0-9]) — and m is the count of
non-overlapping ``V+C+`` runs.  All three engines' regex libraries
(java.util.regex, RE2, Python re) agree on these constructs (no
backrefs in patterns, global replace resumes after each match).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

# ---------------------------------------------------------------------------
# rule tables (suffix, replacement) — ordered longest-first inside each
# step so an ordered CASE implements the paper's longest-match rule
# ---------------------------------------------------------------------------
STEP2 = [
    ("ational", "ate"), ("ization", "ize"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"),
    ("tional", "tion"), ("biliti", "ble"),
    ("entli", "ent"), ("ousli", "ous"), ("ation", "ate"),
    ("alism", "al"), ("aliti", "al"), ("iviti", "ive"),
    ("enci", "ence"), ("anci", "ance"), ("izer", "ize"),
    ("abli", "able"), ("alli", "al"), ("ator", "ate"),
    ("eli", "e"),
]
STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ness", ""),
    ("ful", ""),
]
STEP4 = [
    ("ement", ""),
    ("ance", ""), ("ence", ""), ("able", ""), ("ible", ""), ("ment", ""),
    ("ant", ""), ("ent", ""), ("ion", ""), ("ism", ""), ("ate", ""),
    ("iti", ""), ("ous", ""), ("ive", ""), ("ize", ""),
    ("al", ""), ("er", ""), ("ic", ""), ("ou", ""),
]


# ---------------------------------------------------------------------------
# Python twin
# ---------------------------------------------------------------------------
def _cv(s: str) -> str:
    p = re.sub(r"[aeiou]", "V", s)
    p = re.sub(r"([^V])y", r"\1V", p)
    return re.sub(r"[^V]", "C", p)


def _m(s: str) -> int:
    return len(re.findall(r"V+C+", _cv(s)))


def _hasv(s: str) -> bool:
    return "V" in _cv(s)


def _doublec(s: str) -> bool:
    return len(s) >= 2 and s[-1] == s[-2] and _cv(s).endswith("CC")


def _cvc_o(s: str) -> bool:
    return _cv(s).endswith("CVC") and s[-1] not in "wxy"


def _rules(word: str, rules, min_m: int, ion_special: bool = False) -> str:
    """Longest matching suffix decides; failed condition => unchanged."""
    for suf, rep in rules:
        if word.endswith(suf):
            stem = word[: -len(suf)]
            ok = _m(stem) > min_m
            if ion_special and suf == "ion":
                ok = ok and stem.endswith(("s", "t"))
            return stem + rep if ok else word
    return word


def porter_stem(word: str) -> str:
    if len(word) <= 2:
        return word
    t = word
    # 1a
    if t.endswith("sses") or t.endswith("ies"):
        t = t[:-2]
    elif t.endswith("ss"):
        pass
    elif t.endswith("s"):
        t = t[:-1]
    # 1b
    fired = False
    if t.endswith("eed"):
        if _m(t[:-3]) > 0:
            t = t[:-1]
    elif t.endswith("ed") and _hasv(t[:-2]):
        t, fired = t[:-2], True
    elif t.endswith("ing") and _hasv(t[:-3]):
        t, fired = t[:-3], True
    if fired:
        if t.endswith(("at", "bl", "iz")):
            t = t + "e"
        elif _doublec(t) and t[-1] not in "lsz":
            t = t[:-1]
        elif _m(t) == 1 and _cvc_o(t):
            t = t + "e"
    # 1c
    if t.endswith("y") and _hasv(t[:-1]):
        t = t[:-1] + "i"
    # 2, 3, 4
    t = _rules(t, STEP2, 0)
    t = _rules(t, STEP3, 0)
    t = _rules(t, STEP4, 1, ion_special=True)
    # 5a
    if t.endswith("e"):
        a = _m(t[:-1])
        if a > 1 or (a == 1 and not _cvc_o(t[:-1])):
            t = t[:-1]
    # 5b
    if _m(t) > 1 and _doublec(t) and t[-1] == "l":
        t = t[:-1]
    return t


# ---------------------------------------------------------------------------
# SQL generation (dialect-parametric)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class _Dialect:
    name: str

    def gsub(self, e: str, pat: str, rep: str) -> str:
        if self.name == "spark":
            return f"regexp_replace({e}, '{pat}', '{rep}')"
        return f"regexp_replace({e}, '{pat}', '{rep}', 'g')"

    @property
    def backref(self) -> str:
        return "$1" if self.name == "spark" else "\\1"

    def nmatches(self, e: str, pat: str) -> str:
        if self.name == "spark":
            return f"size(regexp_extract_all({e}, '{pat}', 0))"
        return f"len(regexp_extract_all({e}, '{pat}'))"

    def ends(self, e: str, lit: str) -> str:
        fn = "endswith" if self.name == "spark" else "ends_with"
        return f"{fn}({e}, '{lit}')"


def _sql_cv(d: _Dialect, e: str) -> str:
    p = d.gsub(e, "[aeiou]", "V")
    p = d.gsub(p, "([^V])y", f"{d.backref}V")
    return d.gsub(p, "[^V]", "C")


def _chop(e: str, k: int) -> str:
    return f"substr({e}, 1, length({e}) - {k})" if k else e


def _lastc(e: str, k: int = 0) -> str:
    # last character of chop(e, k)
    return f"substr({e}, length({e}) - {k}, 1)"


# The cv pattern is PREFIX-STABLE: every classification rule looks only
# backward (vowel sets, y-after-non-vowel), and the global regex scan
# is left-to-right, so cv(s[0:n-k]) == cv(s)[0:n-k]. Each stage
# therefore computes the pattern ONCE (three regexes into {cv}) and
# every rule condition just SLICES it — instead of re-deriving the
# pattern per rule (~20 three-regex chains in the wide steps), which is
# what makes the nine-step stemmer affordable at index-build scale.
def _m_chop(d: _Dialect, cv: str, k: int) -> str:
    return d.nmatches(_chop(cv, k), "V+C+")


def _hasv_chop(cv: str, k: int) -> str:
    return f"contains({_chop(cv, k)}, 'V')"


def _sql_doublec(d: _Dialect, cv: str, t: str) -> str:
    return (
        f"(length({t}) >= 2 AND {_lastc(t)} = substr({t}, length({t}) - 1, 1)"
        f" AND {d.ends(cv, 'CC')})"
    )


def _cvc_o_chop(d: _Dialect, cv: str, t: str, k: int) -> str:
    return f"({d.ends(_chop(cv, k), 'CVC')} AND {_lastc(t, k)} NOT IN ('w', 'x', 'y'))"


def _sql_rules(
    d: _Dialect, t: str, cv: str, rules, min_m: int, ion_special: bool = False
) -> str:
    whens = []
    for suf, rep in rules:
        k = len(suf)
        stem = _chop(t, k)
        cond = f"{_m_chop(d, cv, k)} > {min_m}"
        if ion_special and suf == "ion":
            cond = f"({cond} AND ({d.ends(stem, 's')} OR {d.ends(stem, 't')}))"
        out = f"{stem} || '{rep}'" if rep else stem
        whens.append(f"WHEN {d.ends(t, suf)} THEN CASE WHEN {cond} THEN {out} ELSE {t} END")
    return "CASE " + " ".join(whens) + f" ELSE {t} END"


def porter_stages(dialect: str) -> list[dict[str, str]]:
    """Expression layers. Each stage maps output column -> SQL over the
    *previous* stage's columns, referenced as ``{t}`` / ``{fired}`` /
    ``{cv}`` (the c/v pattern of the current ``t``, refreshed by the
    interleaved ``cv`` stages). Apply in order; afterwards guard with
    the <=2-length passthrough on the original token (see
    :func:`stem_tokens_df` / :func:`porter_subquery`)."""
    d = _Dialect(dialect)
    t, cv = "{t}", "{cv}"
    refresh = {"cv": _sql_cv(d, t)}
    s1a = (
        f"CASE WHEN {d.ends(t, 'sses')} THEN {_chop(t, 2)} "
        f"WHEN {d.ends(t, 'ies')} THEN {_chop(t, 2)} "
        f"WHEN {d.ends(t, 'ss')} THEN {t} "
        f"WHEN {d.ends(t, 's')} THEN {_chop(t, 1)} ELSE {t} END"
    )
    s1b = (
        f"CASE WHEN {d.ends(t, 'eed')} THEN "
        f"CASE WHEN {_m_chop(d, cv, 3)} > 0 THEN {_chop(t, 1)} ELSE {t} END "
        f"WHEN {d.ends(t, 'ed')} THEN "
        f"CASE WHEN {_hasv_chop(cv, 2)} THEN {_chop(t, 2)} ELSE {t} END "
        f"WHEN {d.ends(t, 'ing')} THEN "
        f"CASE WHEN {_hasv_chop(cv, 3)} THEN {_chop(t, 3)} ELSE {t} END "
        f"ELSE {t} END"
    )
    fired = (
        f"(NOT {d.ends(t, 'eed')} AND (({d.ends(t, 'ed')} AND {_hasv_chop(cv, 2)})"
        f" OR ({d.ends(t, 'ing')} AND {_hasv_chop(cv, 3)})))"
    )
    s1b2 = (
        f"CASE WHEN NOT {{fired}} THEN {t} "
        f"WHEN {d.ends(t, 'at')} OR {d.ends(t, 'bl')} OR {d.ends(t, 'iz')} THEN {t} || 'e' "
        f"WHEN {_sql_doublec(d, cv, t)} AND {_lastc(t)} NOT IN ('l', 's', 'z') THEN {_chop(t, 1)} "
        f"WHEN {_m_chop(d, cv, 0)} = 1 AND {_cvc_o_chop(d, cv, t, 0)} THEN {t} || 'e' "
        f"ELSE {t} END"
    )
    s1c = (
        f"CASE WHEN {d.ends(t, 'y')} AND {_hasv_chop(cv, 1)} "
        f"THEN {_chop(t, 1)} || 'i' ELSE {t} END"
    )
    s5a = (
        f"CASE WHEN {d.ends(t, 'e')} AND {_m_chop(d, cv, 1)} > 1 THEN {_chop(t, 1)} "
        f"WHEN {d.ends(t, 'e')} AND {_m_chop(d, cv, 1)} = 1 "
        f"AND NOT {_cvc_o_chop(d, cv, t, 1)} THEN {_chop(t, 1)} ELSE {t} END"
    )
    s5b = (
        f"CASE WHEN {_m_chop(d, cv, 0)} > 1 AND {_sql_doublec(d, cv, t)} AND {_lastc(t)} = 'l' "
        f"THEN {_chop(t, 1)} ELSE {t} END"
    )
    return [
        {"t": s1a},  # pure suffix rules, no conditions — no cv needed
        dict(refresh),
        {"fired": fired, "t": s1b},
        dict(refresh),
        {"t": s1b2},
        dict(refresh),
        {"t": s1c},
        dict(refresh),
        {"t": _sql_rules(d, t, cv, STEP2, 0)},
        dict(refresh),
        {"t": _sql_rules(d, t, cv, STEP3, 0)},
        dict(refresh),
        {"t": _sql_rules(d, t, cv, STEP4, 1, ion_special=True)},
        dict(refresh),
        {"t": s5a},
        dict(refresh),
        {"t": s5b},
    ]


def stem_tokens_df(df, col: str):
    """Stem ``df[col]`` in place (Spark). One stacked Project per stage;
    all expressions are built-in-function trees (whole-stage codegen)."""
    from pyspark.sql import functions as F

    work, flag, patt = "__pt", "__pf", "__pc"
    df = df.withColumn(work, df[col])
    names = {"t": work, "fired": flag, "cv": patt}
    for stage in porter_stages("spark"):
        df = df.withColumns(
            {
                names[name]: F.expr(tpl.format(t=work, fired=flag, cv=patt))
                for name, tpl in stage.items()
            }
        )
    out = F.when(F.length(col) <= 2, F.col(col)).otherwise(F.col(work))
    return df.withColumn(col, out).drop(work, flag, patt)


def porter_subquery(inner_sql: str, carry_cols: list[str], tok_col: str = "t") -> str:
    """Wrap a DuckDB SELECT producing ``carry_cols + [tok_col]`` so that
    ``tok_col`` comes out stemmed (same layers, nested subqueries)."""
    carry = ", ".join(carry_cols) + ", " if carry_cols else ""
    sql = (
        f"(SELECT {carry}{tok_col} AS __t0, {tok_col} AS t, "
        f"FALSE AS fired, '' AS cv FROM ({inner_sql}))"
    )
    for stage in porter_stages("duckdb"):
        cols = []
        for name in ("t", "fired", "cv"):
            tpl = stage.get(name)
            cols.append(
                f"{tpl.format(t='t', fired='fired', cv='cv')} AS {name}" if tpl else name
            )
        sql = f"(SELECT {carry}__t0, {', '.join(cols)} FROM {sql})"
    return (
        f"SELECT {carry}CASE WHEN length(__t0) <= 2 THEN __t0 ELSE t END AS {tok_col} "
        f"FROM {sql}"
    )
