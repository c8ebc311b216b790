"""Composed training-data pipeline: the operators wired end-to-end.

The individual cleaning stages (quality scoring, dedup, text analysis)
live in their own modules; real corpus preparation chains them. This
module provides that composition as one declarative plan so Catalyst
optimizes across stage boundaries (e.g. the quality semi-join and the
dedup-survivor semi-join collapse into one scan pipeline — no
intermediate materialization between "stages" as a task-graph system
would have).

Scale notes (100 TB): both stage outputs join back to the corpus as
left-semi joins on the doc id — no row explosion, map-side combinable
aggregations only, and the corpus is scanned twice (once per derived
set) plus once for the final projection; a task-DAG pipeline with
materialized intermediates would write the corpus out between stages
instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import quality_score, token_count
from .dedup import exact_dedup, shingles


def clean_corpus(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Documents that (a) pass the quality heuristics and (b) are the
    surviving representative of their exact-duplicate class. Returns
    (id, n_tokens) — the cleaned corpus manifest with its token budget.
    """
    ok = (
        quality_score(df, id_col, text_col)
        .filter(F.col("quality_ok"))
        .select(F.col(id_col))
    )
    survivors = exact_dedup(df, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return (
        token_count(df, id_col, text_col)
        .join(ok, id_col, "left_semi")
        .join(survivors, id_col, "left_semi")
        .select(F.col(id_col), "n_tokens")
    )


def prepare_corpus(
    docs: DataFrame,
    eval_df: DataFrame | None,
    id_col: str,
    text_col: str,
    decontam_n: int = 13,
    chunk_tokens: int = 2048,
    train_permille: int = 900,
) -> DataFrame:
    """The full training-corpus preparation pipeline, end to end:
    quality gate ∩ exact-dedup survivors (``clean_corpus``), minus
    documents contaminated by the eval set (``decontaminate``), then
    token-chunked (``chunk_documents``) and deterministically split
    (``hash_split``). Returns (id, chunk_id, chunk_text, n_tokens,
    split) — the manifest a trainer consumes.

    Composed as ONE declarative plan: the gates are left-semi joins on
    the doc id that Catalyst stacks onto a single corpus scan pipeline,
    the chunk explode is narrow, and the split is a pure map — so the
    whole pipeline costs the dedup/decontam aggregations plus one scan,
    with no materialized intermediates between stages."""
    survivors = clean_corpus(docs, id_col, text_col).select(F.col(id_col))
    kept = docs.join(survivors, id_col, "left_semi")
    if eval_df is not None:
        ok = (
            decontaminate(docs, eval_df, id_col, text_col, decontam_n)
            .filter(~F.col("contaminated"))
            .select(F.col(id_col))
        )
        kept = kept.join(ok, id_col, "left_semi")
    from ..functions.text import chunk_documents, hash_split

    chunks = chunk_documents(kept, id_col, text_col, chunk_tokens)
    splits = hash_split(kept, id_col, train_permille)
    return chunks.join(splits, id_col)


def sample_mixture(
    df: DataFrame,
    id_col: str,
    source_col: str,
    permille_by_source: dict[str, int],
    default_permille: int = 0,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic data-mixing downsample: keep a document iff its
    md5 permille bucket (same idiom as ``hash_split``) falls under its
    source's rate. The standard way to hit a per-domain token-mixture
    target reproducibly — a pure map-side filter, no RNG state, no
    shuffle, same sample on every run and partitioning."""
    from ..functions.text import md5_permille

    rate = F.lit(default_permille)
    for src, pm in sorted(permille_by_source.items()):
        rate = F.when(F.col(source_col) == src, F.lit(pm)).otherwise(rate)
    return df.filter(md5_permille(id_col, salt) < rate).select(
        F.col(id_col), F.col(source_col)
    )


def cap_per_source(
    df: DataFrame,
    id_col: str,
    source_col: str,
    cap: int,
) -> DataFrame:
    """At most ``cap`` documents per source (the per-domain cap of web
    pipelines), keeping the lowest ids for determinism. One window
    shuffle keyed by source; with few huge sources the window key is
    skewed — at real scale raise parallelism by capping per (source,
    hash-bucket) sub-quota instead, which this composes with."""
    from pyspark.sql import Window

    w = Window.partitionBy(source_col).orderBy(F.col(id_col).asc())
    return (
        df.select(F.col(id_col), F.col(source_col))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cap)
        .select(F.col(id_col), F.col(source_col), F.col("rn").cast("int").alias("rn"))
    )


def cap_per_source_bucketed(
    df: DataFrame,
    id_col: str,
    source_col: str,
    cap: int,
    buckets: int = 32,
) -> DataFrame:
    """Skew-free per-source cap: the cap splits into per-(source,
    hash-bucket) sub-quotas, so the window shuffle keys on (source,
    bucket) — ``buckets``× more parallelism than one window per source,
    which is what survives a corpus where one domain holds 10% of all
    documents. Bucket b of B gets quota ``cap//B + (1 if b < cap%B)``;
    a bucket with fewer documents than its quota under-fills rather
    than rebalancing (deterministic, single-pass — the standard
    trade for eliminating the hot key). The bucket hash is the
    md5-derived formula shared with ``hash_split``, so the selection is
    mirrorable in any SQL engine."""
    from pyspark.sql import Window

    b = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("cap:"), F.col(id_col).cast("string"))), 1, 8),
            16,
            10,
        ).cast("long")
        % buckets
    )
    quota = F.lit(cap // buckets) + F.when(F.col("bucket") < cap % buckets, 1).otherwise(0)
    w = Window.partitionBy(source_col, "bucket").orderBy(F.col(id_col).asc())
    return (
        df.select(F.col(id_col), F.col(source_col))
        .withColumn("bucket", b)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= quota)
        .select(
            F.col(id_col),
            F.col(source_col),
            F.col("bucket").cast("int").alias("bucket"),
            F.col("rn").cast("int").alias("rn"),
        )
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
) -> DataFrame:
    """Train/eval contamination check: for every training document, how
    many of its distinct ``n``-token shingles also appear anywhere in
    the evaluation set (the standard 13-gram-overlap decontamination
    rule; pass a smaller ``n`` for short documents). Returns
    (id, n_eval_grams, contaminated) over ALL training docs.

    Scale shape: the eval side reduces to a distinct-shingle set —
    benchmark suites are tiny next to a 100 TB corpus, so it is
    broadcast and the check is a map-side semi-join on the corpus
    scan; no corpus shuffle. (For an unusually large eval set, drop
    the broadcast hint and let AQE pick the join.)"""
    tr = shingles(train, id_col, text_col, n)
    ev = shingles(eval_df, id_col, text_col, n).select("s").distinct()
    hits = (
        tr.join(F.broadcast(ev), "s", "left_semi")
        .groupBy("id")
        .agg(F.count("*").alias("n_eval_grams"))
        .withColumnRenamed("id", id_col)
    )
    n_hits = F.coalesce(F.col("n_eval_grams"), F.lit(0))
    return (
        train.select(F.col(id_col))
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            n_hits.alias("n_eval_grams"),
            (n_hits > 0).alias("contaminated"),
        )
    )
