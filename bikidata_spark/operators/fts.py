"""Full-text search over the literal dictionary: postings + BM25.

Reference counterpart: DuckDB's FTS extension over ``literals``
(reference main.py:218-220) queried with
``fts_main_literals.match_bm25(hash, q, conjunctive:=1)``
(reference query.py:187-210). Semantics preserved:

- tokenization: lowercase, strip accents (fixed translate map, mirror
  of the reference FTS settings ``strip_accents=1``), split on
  ``[^a-z0-9]+`` (mirror of ``ignore='[^a-zA-Z0-9]+', lower=1``);
  optional full Porter stemming (``stem=True``, the reference default
  ``stemmer='porter'``) via functions/porter.py — every piece
  reproducible in DuckDB SQL so oracles can mirror matches exactly;
- conjunctive match is *within one literal*: every query term must occur
  in the same literal row, whose subjects are then found via ``o``;
- score is BM25 (k1=1.2, b=0.75) over the literal corpus.

Spark-first design: postings are a ``(lit, token, tf)`` DataFrame built
with built-in functions only (explode over split — JVM codegen, no
Python). A query filters postings to its handful of tokens (parquet/row
filter, prunable), joins the tiny per-token df stats with a broadcast,
and reduces per literal. At 100 TB the postings table is written
bucketed by token so a query touches only its tokens' buckets.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as PartitionWindow

from ..functions.porter import porter_stem, stem_tokens_df

TOKEN_SPLIT_RE = "[^a-z0-9]+"
BM25_K1 = 1.2
BM25_B = 0.75
# persisted-store stemmer version: 2 = the full Porter (1980) stemmer in
# functions/porter.py. Version 1 (never stamped) was an early step-1a
# subset; stores stamped with a different version than the reader's are
# refused rather than silently mis-matching query terms.
STEMMER_VERSION = 2

# Accent stripping (reference FTS settings use ``strip_accents=1``,
# main.py:213-218). A fixed 1:1 codepoint map — identical semantics via
# translate() in Spark, DuckDB, and Python — covering precomposed
# lowercase Latin-1 Supplement + Latin Extended-A. Applied after
# lower(), so only lowercase forms are needed. Characters outside the
# map (ß, æ, œ, decomposed combining marks) keep their previous
# behavior of acting as token separators — deterministic in all three
# engines.
_ACCENT_GROUPS = {
    "a": "àáâãäåāăą",
    "c": "çćĉċč",
    "d": "ďđ",
    "e": "èéêëēĕėęě",
    "g": "ĝğġģ",
    "h": "ĥħ",
    "i": "ìíîïĩīĭįı",
    "j": "ĵ",
    "k": "ķ",
    "l": "ĺļľŀł",
    "n": "ñńņň",
    "o": "òóôõöøōŏő",
    "r": "ŕŗř",
    "s": "śŝşš",
    "t": "ţťŧ",
    "u": "ùúûüũūŭůűų",
    "w": "ŵ",
    "y": "ýÿŷ",
    "z": "źżž",
}
ACCENT_SRC = "".join(_ACCENT_GROUPS.values())
ACCENT_DST = "".join(c * len(s) for c, s in _ACCENT_GROUPS.items())
_ACCENT_TRANS = str.maketrans(ACCENT_SRC, ACCENT_DST)


def strip_accents_py(s: str) -> str:
    return s.translate(_ACCENT_TRANS)


def strip_accents_sql(expr: str) -> str:
    """The same map as a SQL ``translate`` call (Spark and DuckDB share
    the signature), for use inside oracle strings."""
    return f"translate({expr}, '{ACCENT_SRC}', '{ACCENT_DST}')"


def fts_settings_from_env() -> dict:
    """``BIKIDATA_FTS_SETTINGS`` parity (reference main.py:207-216): a
    JSON object overriding index-build settings, e.g.
    ``{"stemmer": "porter", "strip_accents": 0}``. Keys we honor:
    ``stemmer`` ("porter" enables the full Porter stemmer, anything
    else disables) and ``strip_accents`` (0/1, default 1 like the
    reference). Unknown keys are ignored; malformed JSON means no
    override."""
    import json
    import os

    raw = os.environ.get("BIKIDATA_FTS_SETTINGS", "")
    if not raw:
        return {}
    try:
        parsed = json.loads(raw)
        if not isinstance(parsed, dict):
            return {}
    except (ValueError, TypeError):
        return {}
    # coerce defensively: valid JSON like {"strip_accents": "false"} or
    # null must configure, not crash the first fts query downstream
    out = {}
    if "stemmer" in parsed:
        out["stemmer"] = str(parsed["stemmer"] or "").lower()
    if "strip_accents" in parsed:
        out["strip_accents"] = 0 if _flag_off(parsed["strip_accents"]) else 1
    return out


def _flag_off(v) -> bool:
    """True when a loosely-typed config value means 'off'."""
    if v is None or v is False:
        return True
    if isinstance(v, str):
        return v.strip().lower() in ("", "0", "false", "no", "off")
    try:
        return int(v) == 0
    except (TypeError, ValueError):
        return False


def tokens_col(col, strip_accents: bool = False):
    """Array of non-empty lowercase tokens for a string column."""
    base = F.lower(col)
    if strip_accents:
        base = F.translate(base, ACCENT_SRC, ACCENT_DST)
    return F.filter(F.split(base, TOKEN_SPLIT_RE), lambda x: x != "")


def tokenize_query(text: str, stem: bool = False, strip_accents: bool = False) -> list[str]:
    # Python str.lower matches Spark's UTF8String lower on everything
    # that can reach an [a-z0-9] token — including İ (U+0130), which
    # BOTH lower to 'i' + combining dot (the mark is a separator).
    # DuckDB's utf8proc maps İ to a bare 'i' instead; that is an
    # oracle-side quirk, not an engine one (see the three-way fuzz).
    s = text.lower()
    if strip_accents:
        s = strip_accents_py(s)
    toks = [t for t in re.split(TOKEN_SPLIT_RE, s) if t]
    return [porter_stem(t) for t in toks] if stem else toks


# a conjunctive match can't return more rows than its rarest term's
# document frequency, so any query whose terms all have df at or below
# this is safe to broadcast WITHOUT counting it first. Matches the
# default engine-side broadcast gate (plans/query._HOP_BROADCAST_ROWS).
BROADCAST_SAFE_DF = 500_000


@dataclass
class FtsIndex:
    postings: DataFrame  # lit: long, token: string, tf: long
    token_df: DataFrame  # token: string, df: long
    doc_len: DataFrame  # lit: long, dl: long
    n_docs: int
    avgdl: float
    # set when read from a persisted store: postings/token_df carry a
    # `bucket` partition column (pmod(xxhash64(token), num_buckets)) so
    # a query's scan is pruned to its terms' buckets
    num_buckets: int | None = None
    # tokens were stemmed at build time; query terms get the same rule
    stem: bool = False
    # accents were stripped at build time (reference default); query
    # terms get the same translate map
    strip: bool = True
    # lazy driver-side {token: df} for tokens ABOVE BROADCAST_SAFE_DF —
    # the Zipf head, so bounded (typically a handful of stop-word-ish
    # tokens even at corpus scale). Built once per index by the first
    # match_upper_bound() call; every later fts query gates its
    # broadcast with ZERO Spark jobs where the previous shape paid a
    # persist + count per query.
    _heavy_memo: dict | None = None
    # LRU of exact df per already-probed query token (see term_dfs)
    _df_lru: dict | None = None
    # exact corpus token count (sum of dl over docs) — the integer
    # numerator of avgdl, carried so with_new_literals can update avgdl
    # BIT-IDENTICALLY to a rebuild (dl sums are ints, exact in doubles
    # below 2^53; the single fl(S/N) division then matches Spark's avg).
    # None on indexes opened from pre-r8 stores — backfilled lazily.
    total_dl: int | None = None
    # cumulative incremental state across with_new_literals calls:
    # {"postings"/"token_df"/"doc_len": the PRE-increment base frames,
    #  "rows": every incremental posting row so far, "doc_rows": every
    #  (lit, dl), "inc": cumulative per-token df increments} — each
    # call rebuilds CONSTANT-depth frames from the base + one
    # LocalRelation (chaining one union/join per batch would re-create
    # the plan-depth pathology Engine._mut_buffers exists to avoid)
    _incr_state: dict | None = None
    # the collected (lit, token, tf, dl) rows of the LAST incremental
    # batch — consumed by LocalTier.carry_fts_mirror to patch the
    # driver-side postings mirror without re-collecting the corpus
    _last_increment: list | None = None

    def heavy_tokens(self) -> dict:
        if self._heavy_memo is None:
            rows = (
                self.token_df.filter(F.col("df") > BROADCAST_SAFE_DF)
                .select("token", "df")
                .collect()
            )
            self._heavy_memo = {r["token"]: int(r["df"]) for r in rows}
        return self._heavy_memo

    def match_upper_bound(self, text: str) -> int:
        """Upper bound on ``match(text, conjunctive=True)``'s row count:
        a conjunctive match is contained in its rarest term's postings,
        so the bound is min over terms of (exact df if the token is in
        the heavy head, else BROADCAST_SAFE_DF)."""
        terms = list(dict.fromkeys(tokenize_query(text, self.stem, self.strip)))
        if not terms:
            return 0
        heavy = self.heavy_tokens()
        return min(heavy.get(t, BROADCAST_SAFE_DF) for t in terms)

    def term_dfs(self, text: str) -> dict:
        """EXACT df per query term, driver-side: heavy-head tokens come
        from the memoized Zipf head, the rest from one bucket-pruned
        probe of token_df per previously-unseen token (LRU'd on the
        index, so repeated serving terms cost zero jobs). Absent tokens
        have df 0. This powers the term-at-a-time point path: with df
        known, BM25 idf becomes a literal (no token_df join in the
        match plan) and ``min(df)`` decides collect-vs-broadcast with
        certainty instead of an upper bound."""
        terms = list(dict.fromkeys(tokenize_query(text, self.stem, self.strip)))
        if not terms:
            return {}
        heavy = self.heavy_tokens()
        if self._df_lru is None:
            self._df_lru = {}
        out: dict = {}
        missing: list[str] = []
        for t in terms:
            if t in heavy:
                out[t] = heavy[t]
            elif t in self._df_lru:
                out[t] = self._df_lru[t]
            else:
                missing.append(t)
        if missing:
            rows = self._term_postings(self.token_df, missing).collect()
            found = {r["token"]: int(r["df"]) for r in rows}
            for t in missing:
                df = found.get(t, 0)
                out[t] = df
                self._df_lru[t] = df
            while len(self._df_lru) > 65536:
                self._df_lru.pop(next(iter(self._df_lru)))
        return out

    def _term_postings(self, df: DataFrame, terms: list[str]) -> DataFrame:
        cond = F.col("token").isin(terms)
        if self.num_buckets:
            buckets = sorted({_token_bucket(t, self.num_buckets) for t in terms})
            # partition-pruned: only these directories are listed/read
            cond = F.col("bucket").isin(buckets) & cond
        return df.filter(cond)

    def with_new_literals(self, lits: list) -> "FtsIndex | None":
        """Incrementally indexed copy for newly-inserted literal terms
        — the mutation-path alternative to dropping the index and
        re-tokenizing the whole corpus on the next fts query.

        ``lits`` is [(hash, value)] of literals NEW to the term
        dictionary (Engine.mutate knows this set exactly). One
        request-sized job tokenizes them with the SAME build expressions
        (tokens_col/token_postings — identical stemming, accents,
        tf/dl); the collected rows then extend every structure:

        - postings/doc_len: unionAll of a LocalRelation (the persisted
          corpus scan is untouched; the tiny branch rides along).
        - token_df: outer-merge with the per-token df increments —
          exact integer arithmetic, so a no-dfs ``match`` joins the
          same df a rebuild would produce.
        - n_docs/avgdl: avgdl = total_dl/n_docs over exact ints — the
          one float division, bit-identical to the rebuild's avg (dl
          sums are exact in doubles below 2^53).
        - heavy memo / df LRU: carried with driver-side increments. (A
          token crossing BROADCAST_SAFE_DF mid-stream that was never
          LRU-probed stays out of the heavy memo until the next probe;
          match_upper_bound's bound is then off by at most the
          request-sized increment — harmless against the gate margins.)

        Increments ACCUMULATE in ``_incr_state`` and every call rebuilds
        from the pre-increment base frames plus ONE LocalRelation, so
        plan depth stays constant no matter how many batches land.
        Returns None (caller should drop + rebuild) past a buffered-row
        cap. Rebuild equivalence is pinned by tests/test_mutate_tier.py
        against a from-scratch engine, scores compared exactly."""
        st = self._incr_state or {
            "postings": self.postings,
            "token_df": self.token_df,
            "doc_len": self.doc_len,
            "rows": [],
            "doc_rows": [],
            "inc": {},
        }
        if len(st["rows"]) >= 100_000:
            return None
        spark = self.postings.sparkSession
        total_dl = self.total_dl
        if total_dl is None:  # pre-r8 store: backfill the exact numerator once
            total_dl = int(
                self.doc_len.agg(F.sum("dl").alias("s")).collect()[0]["s"] or 0
            )
        # tokenize DRIVER-SIDE, zero jobs: tokenize_query is fuzz-pinned
        # element-identical to the JVM tokens_col (tests/
        # test_cross_engine_fuzz.py), porter_stem to the JVM stemmer
        # (three-engine fuzz), and _token_bucket to the bucket column —
        # so these rows are byte-what the build pipeline would emit,
        # re-checked end-to-end by the exact-score rebuild-equality test
        rows: list[dict] = []
        for lit, value in lits:
            toks = tokenize_query(value, stem=False, strip_accents=self.strip)
            if not toks:
                continue
            dl = len(toks)  # dl = occurrence count, invariant under stem re-agg
            counts: dict[str, int] = {}
            for t in (porter_stem(x) for x in toks) if self.stem else toks:
                counts[t] = counts.get(t, 0) + 1
            for t, tf in sorted(counts.items()):
                d = {"lit": int(lit), "token": t, "tf": tf, "dl": dl}
                if self.num_buckets:
                    d["bucket"] = _token_bucket(t, self.num_buckets)
                rows.append(d)
        if not rows:
            # every new literal tokenized to nothing: corpus unchanged
            return self
        from ..graph import local_relation

        all_rows = st["rows"] + rows
        doc_rows = sorted(
            set(st["doc_rows"]) | {(int(r["lit"]), int(r["dl"])) for r in rows}
        )
        inc: dict[str, int] = dict(st["inc"])
        for r in rows:
            inc[r["token"]] = inc.get(r["token"], 0) + 1
        _types = {"lit": "long", "token": "string", "tf": "long", "dl": "long", "bucket": "int"}
        pcols = st["postings"].columns
        postings2 = st["postings"].unionAll(
            local_relation(
                spark,
                [tuple(r[c] for c in pcols) for r in all_rows],
                ", ".join(f"{c} {_types[c]}" for c in pcols),
            )
        )
        doc_len2 = st["doc_len"].unionAll(
            local_relation(
                spark,
                doc_rows,
                ", ".join(f"{f.name} long" for f in st["doc_len"].schema.fields),
            )
        )
        delta = local_relation(spark, sorted(inc.items()), "token string, _d long")
        tcols = st["token_df"].columns
        merged = st["token_df"].join(delta, "token", "full").withColumn(
            "df", F.coalesce(F.col("df"), F.lit(0)) + F.coalesce(F.col("_d"), F.lit(0))
        )
        if "bucket" in tcols:
            merged = merged.withColumn(
                "bucket",
                F.coalesce(
                    F.col("bucket"), _token_bucket_col(F.col("token"), self.num_buckets)
                ),
            )
        token_df2 = merged.select(*tcols)
        n_docs2 = self.n_docs + len({int(r["lit"]) for r in rows})
        total_dl2 = total_dl + sum(int(r["tf"]) for r in rows)
        heavy = dict(self._heavy_memo) if self._heavy_memo is not None else None
        lru = dict(self._df_lru) if self._df_lru else {}
        batch_inc: dict[str, int] = {}
        for r in rows:  # THIS batch only — the memos already carry
            batch_inc[r["token"]] = batch_inc.get(r["token"], 0) + 1
        for t, c in batch_inc.items():
            if heavy is not None and t in heavy:
                heavy[t] += c
            elif t in lru:
                lru[t] += c
                if heavy is not None and lru[t] > BROADCAST_SAFE_DF:
                    heavy[t] = lru.pop(t)
            # tokens never probed stay out of both memos — the next
            # term_dfs probe reads the merged token_df (exact)
        return FtsIndex(
            postings=postings2,
            token_df=token_df2,
            doc_len=doc_len2,
            n_docs=n_docs2,
            avgdl=total_dl2 / n_docs2,
            num_buckets=self.num_buckets,
            stem=self.stem,
            strip=self.strip,
            _heavy_memo=heavy,
            _df_lru=lru,
            total_dl=total_dl2,
            _incr_state={
                "postings": st["postings"],
                "token_df": st["token_df"],
                "doc_len": st["doc_len"],
                "rows": all_rows,
                "doc_rows": doc_rows,
                "inc": inc,
            },
            _last_increment=rows,
        )

    def match(
        self, text: str, conjunctive: bool = True, dfs: dict | None = None
    ) -> DataFrame:
        """Literals matching ``text`` → (lit, score). BM25-scored.

        With ``dfs`` (exact per-term document frequencies from
        :meth:`term_dfs`), df is injected as a per-term LITERAL column
        instead of a broadcast token_df join — one broadcast-exchange
        job fewer in every downstream action, and the arithmetic is
        bit-identical (the same JVM expressions over the same values)."""
        # dedupe (order-preserving): stemming can collapse distinct query
        # words into one term ('customer customers' → ['custom','custom']);
        # count_distinct(token) could then never reach len(terms) and a
        # conjunctive query would return zero rows for a matching literal
        terms = list(dict.fromkeys(tokenize_query(text, self.stem, self.strip)))
        if not terms:
            return self.postings.sparkSession.createDataFrame([], "lit long, score double")
        n = self.n_docs
        if dfs is not None and all(t in dfs for t in terms):
            hits = self._term_postings(self.postings, terms)
            df_col = F.lit(float(dfs[terms[0]]))
            for t in terms[1:]:
                df_col = F.when(F.col("token") == t, float(dfs[t])).otherwise(df_col)
            hits = hits.withColumn("df", df_col.cast("long"))
        else:
            hits = self._term_postings(self.postings, terms).join(
                F.broadcast(self._term_postings(self.token_df, terms)), "token"
            )
        if "dl" not in self.postings.columns:
            # persisted/incremental stores keep the normalized layout —
            # resolve document length with the join the in-memory index
            # pre-paid at build time
            hits = hits.join(self.doc_len, "lit")
        # BM25: idf = ln(1 + (N - df + 0.5)/(df + 0.5))
        idf = F.log(F.lit(1.0) + (F.lit(float(n)) - F.col("df") + 0.5) / (F.col("df") + 0.5))
        tf_part = (F.col("tf") * (BM25_K1 + 1)) / (
            F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.lit(self.avgdl))
        )
        scored = hits.groupBy("lit").agg(
            F.count_distinct("token").alias("nmatch"),
            F.sum(idf * tf_part).alias("score"),
        )
        if conjunctive:
            scored = scored.filter(F.col("nmatch") == len(terms))
        return scored.select("lit", "score")


def entity_text(graph, hops: int = 2) -> DataFrame:
    """Per-subject concatenation of its literal values, including
    literals reachable through ``hops``-1 levels of child entities —
    the reference's entity-grouped ``fts`` table (main.py:229-272:
    temp_fts1 = own literals, temp_fts2 = literals of objects one hop
    away). Returns (s, text). Feeds the semantic index build.

    Values are sorted before aggregation so the concatenation is
    deterministic under any partitioning."""
    t = graph.triples
    lits = graph.literals().select(F.col("hash").alias("_lh"), F.col("value").alias("_lv"))
    own = t.join(lits, t.o == F.col("_lh")).select("s", "_lv")
    layers = [own]
    frontier = own
    for _ in range(max(0, hops - 1)):
        # literals of my objects: T.s --o--> child, child's literal text
        child_text = frontier.select(F.col("s").alias("_child"), "_lv")
        hop = (
            t.join(child_text, t.o == F.col("_child"))
            .select("s", "_lv")
        )
        layers.append(hop)
        frontier = hop
    from functools import reduce

    all_lits = reduce(lambda a, b: a.unionAll(b), layers).distinct()
    return (
        all_lits.groupBy("s")
        .agg(F.array_join(F.array_sort(F.collect_set("_lv")), "\n").alias("text"))
    )


def _token_bucket(token: str, num_buckets: int) -> int:
    """Bucket id for a token. ``zlib.crc32`` here is bit-identical to
    Spark's ``crc32`` builtin used at write time, so query-time pruning
    needs no Spark job."""
    import zlib

    return zlib.crc32(token.encode("utf8")) % num_buckets


def _token_bucket_col(col, num_buckets: int):
    return F.pmod(F.crc32(col.cast("binary")), F.lit(num_buckets)).cast("int")


def write_fts_index(index: FtsIndex, path: str, num_buckets: int = 64) -> None:
    """Persist the index with postings and token stats hash-partitioned
    by token bucket: a conjunctive query then reads only its terms'
    bucket directories (partition pruning — the 100 TB layout where a
    3-term query touches 3/64ths of the postings store).

    Postings persist WITH the per-literal document length ``dl``
    (norms-in-postings, the classic search-engine layout): a served
    ``match`` on the re-opened store then scores from the pruned
    postings rows alone — no corpus-sized ``doc_len`` join per query.
    The denormalization costs one lit-keyed join at WRITE time and
    ~8 bytes/posting of storage; ``read_fts_index``/``match`` detect
    the column, so stores written before this layout still work via
    the join fallback."""
    postings = index.postings
    if "dl" not in postings.columns:
        # index came from a normalized source (an old persisted store,
        # an incremental log): pay the norms join here, once
        postings = postings.join(index.doc_len, "lit")
    (
        postings
        .withColumn("bucket", _token_bucket_col(F.col("token"), num_buckets))
        .repartition("bucket")
        .sortWithinPartitions("token")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{path}/postings")
    )
    (
        index.token_df.withColumn("bucket", _token_bucket_col(F.col("token"), num_buckets))
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{path}/token_df")
    )
    index.doc_len.write.mode("overwrite").parquet(f"{path}/doc_len")
    stats = index.postings.sparkSession.createDataFrame(
        [(index.n_docs, float(index.avgdl), num_buckets, index.stem, index.strip, STEMMER_VERSION)],
        "n_docs long, avgdl double, num_buckets int, stem boolean, strip boolean, stemver int",
    )
    stats.coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")


def read_fts_index(spark, path: str) -> FtsIndex:
    """Open a persisted index; ``match`` prunes bucket partitions.

    Back-compat is conservative: a stats row WITHOUT the ``strip``
    column predates accent stripping, so the store was built without it
    — default ``strip=False`` (defaulting True would strip query terms
    the persisted tokens never were). A ``stem=True`` store without a
    ``stemver`` column was built by an incompatible earlier stemmer;
    applying today's full Porter rules to query terms would silently
    miss — refuse and ask for a rebuild instead."""
    stats = spark.read.parquet(f"{path}/stats").collect()[0]
    d = stats.asDict()
    stem = bool(d.get("stem", False))
    if stem and d.get("stemver") != STEMMER_VERSION:
        raise ValueError(
            f"FTS store at {path!r} was stemmed with an incompatible stemmer "
            f"(stemver={d.get('stemver')!r}, current={STEMMER_VERSION}); query-side "
            "stemming would not match the persisted tokens. Rebuild the index "
            "with build_fts_index(stem=True) + write_fts_index."
        )
    return FtsIndex(
        postings=spark.read.parquet(f"{path}/postings"),
        token_df=spark.read.parquet(f"{path}/token_df"),
        doc_len=spark.read.parquet(f"{path}/doc_len"),
        n_docs=stats["n_docs"],
        avgdl=stats["avgdl"],
        num_buckets=stats["num_buckets"],
        stem=stem,
        strip=bool(d.get("strip", False)),
    )


def token_postings(toks: DataFrame, stem: bool) -> DataFrame:
    """(lit, token, tf) postings from an exploded (lit, token) stream.

    With ``stem``, RAW postings aggregate first — the occurrence-level
    shuffle is identical to the unstemmed build — then the Porter
    stemmer runs over the POSTINGS rows (already deduplicated to
    distinct (doc, token) pairs) that can possibly change (see the
    numeric/short identity gate below) and same-stem rows re-aggregate
    with a postings-sized second shuffle. Stemming per posting instead of
    per occurrence captures most of the Zipf dedup win (postings ≤
    occurrences, and the re-agg shuffle it needs is postings-sized)
    while staying ONE lineage — no extra distinct / checkpoint /
    broadcast jobs, whose fixed latencies dominate at small scale.
    (A per-TYPE variant — stem the distinct vocabulary, join the
    mapping back — saves a further |postings|/|vocab| factor of
    stemmer evaluations but costs a vocabulary materialization and a
    mapping join per build; measured at sf0.1–sf1 the extra jobs cost
    more than the regex they save.)"""
    raw = toks.groupBy("lit", "token").agg(F.count("*").alias("tf"))
    if not stem:
        return raw
    # PURE-NUMERIC tokens are Porter fixed points (every rule needs an
    # alphabetic suffix — s/ed/ing/…/e/ll — which a [0-9]+ token cannot
    # end with), and ≤2-char tokens are identity by the stemmer's own
    # final gate. Routing those rows AROUND the nine-layer regex tower
    # and unioning back before the re-aggregation is semantically
    # identical (the groupBy still merges stem collisions like
    # "12s"→"12" with a doc's existing "12") but skips the tower for
    # the dominant row class: key/phone/amount-style corpora are >90%
    # numeric tokens, measured 4.3 s → 1.7 s for the sf0.1 stemmed
    # build. Both branches read the SAME shuffle output (Spark reuses
    # the exchange), so the split costs no extra scan of the corpus.
    gate = F.col("token").rlike("^[0-9]+$") | (F.length("token") <= 2)
    stemmed = stem_tokens_df(raw.filter(~gate), "token")
    return (
        stemmed.unionAll(raw.filter(gate))
        .groupBy("lit", "token")
        .agg(F.sum("tf").alias("tf"))
    )


def build_fts_index(
    literals: DataFrame, stem: bool = False, strip_accents: bool = True
) -> FtsIndex:
    """Index ``(hash, value)`` literals. One scan, one shuffle (groupBy
    token+lit), map-side combine via partial aggregation. ``stem=True``
    applies the full Porter stemmer (the reference's default indexing
    mode, main.py:217-220) per vocabulary TYPE — see
    :func:`token_postings`."""
    toks = literals.select(
        F.col("hash").alias("lit"),
        F.explode(tokens_col(F.col("value"), strip_accents)).alias("token"),
    )
    raw = token_postings(toks, stem)
    # denormalize dl INTO the postings (norms-in-postings, the classic
    # search-engine layout): match() then scores from the postings rows
    # alone — no corpus-sized doc_len join per query, which was the one
    # shuffle-bearing stage left on the fts serving path. dl rides a
    # WINDOW over the lit re-partition instead of a doc_len aggregate +
    # postings-sized join — one shuffle fewer, measured 27% off the
    # sf0.1 build. The count materializes now: "build" should pay the
    # build cost, not the first query (persist alone is lazy).
    postings = raw.withColumn(
        "dl", F.sum("tf").over(PartitionWindow.partitionBy("lit"))
    ).persist()
    postings.count()
    token_df = postings.groupBy("token").agg(F.count("*").alias("df")).persist()
    token_df.count()
    # per-doc lengths derive lazily from the cached postings (dl is
    # constant within a lit); only the store write path and old-layout
    # fallbacks read this frame
    doc_len = postings.groupBy("lit").agg(F.max("dl").alias("dl"))
    stats = doc_len.agg(
        F.count("*").alias("n"),
        F.avg("dl").alias("avgdl"),
        F.sum("dl").alias("total_dl"),
    ).collect()[0]
    return FtsIndex(
        postings=postings,
        token_df=token_df,
        doc_len=doc_len,
        n_docs=stats["n"] or 0,
        avgdl=float(stats["avgdl"] or 1.0),
        stem=stem,
        strip=strip_accents,
        total_dl=int(stats["total_dl"] or 0),
    )
