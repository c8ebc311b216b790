"""Full-text search over the literal dictionary: postings + BM25.

Reference counterpart: DuckDB's FTS extension over ``literals``
(reference main.py:218-220) queried with
``fts_main_literals.match_bm25(hash, q, conjunctive:=1)``
(reference query.py:187-210). Semantics preserved:

- tokenization: lowercase, split on ``[^a-z0-9]+`` (mirror of the
  reference FTS settings ``ignore='[^a-zA-Z0-9]+', lower=1``; we do not
  stem — SURVEY.md §6, so oracles can reproduce matches in plain SQL);
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

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"
BM25_K1 = 1.2
BM25_B = 0.75


def tokens_col(col, stem: bool = False):
    """Array of non-empty lowercase tokens for a string column."""
    toks = F.filter(F.split(F.lower(col), TOKEN_SPLIT_RE), lambda x: x != "")
    if stem:
        toks = F.transform(toks, _stem_col)
    return toks


def _stem_col(t):
    """Plural stemming, porter step-1a subset (the reference indexes
    with ``stemmer='porter'`` by default, main.py:218-220; this is the
    deterministic subset expressible identically in any SQL engine —
    no lookbehind, no backrefs, so DuckDB/RE2 oracles can mirror it):
    sses→ss, ies→i, ss stays, trailing s drops."""
    n = F.length(t)
    return (
        F.when(t.rlike("sses$"), t.substr(F.lit(1), n - 2))
        .when(t.rlike("ies$"), t.substr(F.lit(1), n - 2))
        .when(t.rlike("ss$"), t)
        .when(t.rlike(".s$"), t.substr(F.lit(1), n - 1))
        .otherwise(t)
    )


def stem_token(t: str) -> str:
    """Python twin of :func:`_stem_col` for query-side terms."""
    if t.endswith("sses") or t.endswith("ies"):
        return t[:-2]
    if t.endswith("ss"):
        return t
    if len(t) >= 2 and t.endswith("s"):
        return t[:-1]
    return t


def stem_sql(expr: str) -> str:
    """The same rule as a dialect-neutral SQL CASE over ``expr``
    (used verbatim inside DuckDB oracle strings)."""
    return (
        f"CASE WHEN regexp_matches({expr}, 'sses$') THEN substr({expr}, 1, length({expr}) - 2) "
        f"WHEN regexp_matches({expr}, 'ies$') THEN substr({expr}, 1, length({expr}) - 2) "
        f"WHEN regexp_matches({expr}, 'ss$') THEN {expr} "
        f"WHEN regexp_matches({expr}, '.s$') THEN substr({expr}, 1, length({expr}) - 1) "
        f"ELSE {expr} END"
    )


def tokenize_query(text: str, stem: bool = False) -> list[str]:
    import re

    toks = [t for t in re.split(TOKEN_SPLIT_RE, text.lower()) if t]
    return [stem_token(t) for t in toks] if stem else toks


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

    def _term_postings(self, df: DataFrame, terms: list[str]) -> DataFrame:
        cond = F.col("token").isin(terms)
        if self.num_buckets:
            buckets = sorted({_token_bucket(t, self.num_buckets) for t in terms})
            # partition-pruned: only these directories are listed/read
            cond = F.col("bucket").isin(buckets) & cond
        return df.filter(cond)

    def match(self, text: str, conjunctive: bool = True) -> DataFrame:
        """Literals matching ``text`` → (lit, score). BM25-scored."""
        terms = tokenize_query(text, self.stem)
        if not terms:
            return self.postings.sparkSession.createDataFrame([], "lit long, score double")
        n = self.n_docs
        hits = (
            self._term_postings(self.postings, terms)
            .join(F.broadcast(self._term_postings(self.token_df, terms)), "token")
            .join(self.doc_len, "lit")
        )
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
    3-term query touches 3/64ths of the postings store)."""
    (
        index.postings.withColumn("bucket", _token_bucket_col(F.col("token"), num_buckets))
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
        [(index.n_docs, float(index.avgdl), num_buckets, index.stem)],
        "n_docs long, avgdl double, num_buckets int, stem boolean",
    )
    stats.coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")


def read_fts_index(spark, path: str) -> FtsIndex:
    """Open a persisted index; ``match`` prunes bucket partitions."""
    stats = spark.read.parquet(f"{path}/stats").collect()[0]
    return FtsIndex(
        postings=spark.read.parquet(f"{path}/postings"),
        token_df=spark.read.parquet(f"{path}/token_df"),
        doc_len=spark.read.parquet(f"{path}/doc_len"),
        n_docs=stats["n_docs"],
        avgdl=stats["avgdl"],
        num_buckets=stats["num_buckets"],
        stem=bool(stats["stem"]) if "stem" in stats.asDict() else False,
    )


def build_fts_index(literals: DataFrame, stem: bool = False) -> FtsIndex:
    """Index ``(hash, value)`` literals. One scan, one shuffle (groupBy
    token+lit), map-side combine via partial aggregation. ``stem=True``
    applies the porter-subset plural stemmer (reference default)."""
    toks = literals.select(
        F.col("hash").alias("lit"), F.explode(tokens_col(F.col("value"), stem)).alias("token")
    )
    postings = toks.groupBy("lit", "token").agg(F.count("*").alias("tf")).persist()
    # materialize now — "build" should pay the build cost, not the first
    # query (persist alone is lazy). ONE tokenize scan: doc_len (dl =
    # sum tf) and token_df both derive from the cached postings.
    postings.count()
    doc_len = postings.groupBy("lit").agg(F.sum("tf").alias("dl")).persist()
    token_df = postings.groupBy("token").agg(F.count("*").alias("df")).persist()
    token_df.count()
    stats = doc_len.agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl")).collect()[0]
    return FtsIndex(
        postings=postings,
        token_df=token_df,
        doc_len=doc_len,
        n_docs=stats["n"] or 0,
        avgdl=float(stats["avgdl"] or 1.0),
        stem=stem,
    )
