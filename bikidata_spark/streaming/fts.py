"""Incremental FTS index maintenance on streaming insert.

The reference rebuilds its FTS index from scratch (main.py:218-220 runs
the PRAGMA over the whole literals table); at 100 TB a rebuild per
ingest wave is not an option. This module keeps the persisted
token-bucketed index (operators/fts.py) CURRENT as mutations stream in:

- each micro-batch takes its INSERT literals, drops ones already
  indexed (anti-join against the store's seen-literal log — the same
  store-resident-state move as ``start_dedup_ingest``), tokenizes with
  the store's own settings, and appends a per-batch index SEGMENT:
  postings + partial token document-frequencies (both bucket-
  partitioned inside the batch directory), doc lengths, and a one-row
  partial stats record;
- segments land in batch-id-derived directories with overwrite mode —
  the idempotent-retry contract of every sink in this package;
- ``read_incremental_fts`` recombines segments lazily: postings and
  doc_len union (disjoint by construction — the seen-log guarantees a
  literal is indexed exactly once), token df SUMS across segments
  behind the bucket/token filters (Catalyst pushes a query's
  ``token IN (...)`` and bucket pruning below the aggregate, so a
  match still reads only its terms' bucket directories), and the
  corpus stats fold from the tiny per-batch partials.

The result is a normal :class:`~bikidata_spark.operators.fts.FtsIndex`
— ``match`` is unchanged, BM25 scores are exactly what a from-scratch
build over the same literals would produce (verified in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import term_hash
from ..operators.fts import (
    FtsIndex,
    _token_bucket_col,
    token_postings,
    tokens_col,
)
from .mutations import MUTATION_SCHEMA, _read_log, _read_log_excluding


def start_fts_ingest(
    spark: SparkSession,
    src_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    num_buckets: int = 64,
    stem: bool = False,
    strip_accents: bool = True,
    trigger_available_now: bool = True,
):
    """Maintain an FTS store from the same JSON mutation stream the quad
    ingest reads ({action, s, p, o, g}): every INSERT whose object is a
    literal contributes its tokens, exactly once per distinct literal.

    If the store already has a ``meta`` record (a bootstrap or an
    earlier ingest), ITS settings win — segments of one store must all
    tokenize identically or the merged index is silently wrong. Only a
    genuinely-missing meta path writes fresh settings; any OTHER read
    failure re-raises rather than silently re-tokenizing the store.

    Scope: the rebuild-equivalence guarantee (BM25 identical to a
    from-scratch build) holds for INSERT-only streams; deletes in the
    mutation stream are not reflected in the index — drop and
    re-bootstrap (or compact the quad store first) to shed literals."""
    from pyspark.errors import AnalysisException

    try:
        existing = spark.read.parquet(f"{store_dir}/meta").collect()[0]
        num_buckets = int(existing["num_buckets"])
        stem = bool(existing["stem"])
        strip_accents = bool(existing["strip"])
    except AnalysisException as exc:
        # write defaults only when the path truly doesn't exist yet;
        # a transient read failure must NOT overwrite real settings
        msg = str(exc)
        if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
            raise
        meta = spark.createDataFrame(
            [(num_buckets, stem, strip_accents)],
            "num_buckets int, stem boolean, strip boolean",
        )
        meta.coalesce(1).write.mode("overwrite").parquet(f"{store_dir}/meta")

    # segment layout conformance: every postings segment of one store
    # must have the same schema (the union read takes one file's schema).
    # New stores write norms-in-postings (dl denormalized — match()
    # then needs no doc_len join); a store whose existing segments lack
    # dl keeps the normalized layout until compact_fts_store upgrades it.
    try:
        dl_in_postings = "dl" in spark.read.parquet(f"{store_dir}/postings").columns
    except AnalysisException:
        dl_in_postings = True

    stream = spark.readStream.schema(MUTATION_SCHEMA).json(src_dir)

    def process(batch: DataFrame, batch_id: int) -> None:
        lits = (
            batch.filter((F.col("action") == "insert") & F.col("o").startswith('"'))
            .select(term_hash("o").alias("lit"), F.col("o").alias("value"))
            .distinct()
        )
        try:
            # exclude this batch's own seen segment: a replayed batch
            # must regenerate its segments, not anti-join to empty and
            # overwrite them with nothing (permanent index data loss)
            seen = _read_log_excluding(spark, f"{store_dir}/seen", batch_id)
            lits = lits.join(seen, "lit", "left_anti")
        except Exception:
            pass  # first segment: nothing indexed yet
        lits = lits.persist()
        toks = lits.select(
            "lit", F.explode(tokens_col(F.col("value"), strip_accents)).alias("token")
        )
        postings = (
            token_postings(toks, stem)
            .withColumn("bucket", _token_bucket_col(F.col("token"), num_buckets))
            .persist()
        )
        doc_len = postings.groupBy("lit").agg(F.sum("tf").alias("dl")).persist()
        seg = postings.join(doc_len, "lit") if dl_in_postings else postings
        (
            seg.repartition("bucket")
            .sortWithinPartitions("token")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{store_dir}/postings/batch={batch_id}")
        )
        (
            postings.groupBy("bucket", "token")
            .agg(F.count("*").alias("df"))
            .repartition("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{store_dir}/token_df/batch={batch_id}")
        )
        doc_len.write.mode("overwrite").parquet(f"{store_dir}/doc_len/batch={batch_id}")
        part = doc_len.agg(
            F.count("*").alias("n_docs"), F.coalesce(F.sum("dl"), F.lit(0)).alias("sum_dl")
        )
        part.coalesce(1).write.mode("overwrite").parquet(
            f"{store_dir}/stats/batch={batch_id}"
        )
        lits.select("lit").write.mode("overwrite").parquet(
            f"{store_dir}/seen/batch={batch_id}"
        )
        postings.unpersist()
        doc_len.unpersist()
        lits.unpersist()

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def bootstrap_fts_store(
    literals: DataFrame,
    store_dir: str,
    num_buckets: int = 64,
    stem: bool = False,
    strip_accents: bool = True,
) -> None:
    """Seed an incremental store from an EXISTING corpus (hash, value)
    so bulk history + future stream compose: writes the bulk index as
    segment ``batch=-1`` (stream batch ids are >= 0) plus the seen-log,
    with the same layout ``start_fts_ingest`` appends to."""
    spark = literals.sparkSession
    meta = spark.createDataFrame(
        [(num_buckets, stem, strip_accents)],
        "num_buckets int, stem boolean, strip boolean",
    )
    meta.coalesce(1).write.mode("overwrite").parquet(f"{store_dir}/meta")
    lits = literals.select(F.col("hash").alias("lit"), "value").distinct().persist()
    toks = lits.select(
        "lit", F.explode(tokens_col(F.col("value"), strip_accents)).alias("token")
    )
    postings = (
        token_postings(toks, stem)
        .withColumn("bucket", _token_bucket_col(F.col("token"), num_buckets))
        .persist()
    )
    doc_len = postings.groupBy("lit").agg(F.sum("tf").alias("dl")).persist()
    (
        # norms-in-postings: match() on the merged store scores from
        # pruned postings rows alone, no corpus doc_len join per query
        postings.join(doc_len, "lit")
        .repartition("bucket")
        .sortWithinPartitions("token")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{store_dir}/postings/batch=-1")
    )
    (
        postings.groupBy("bucket", "token")
        .agg(F.count("*").alias("df"))
        .repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{store_dir}/token_df/batch=-1")
    )
    doc_len.write.mode("overwrite").parquet(f"{store_dir}/doc_len/batch=-1")
    doc_len.agg(
        F.count("*").alias("n_docs"), F.coalesce(F.sum("dl"), F.lit(0)).alias("sum_dl")
    ).coalesce(1).write.mode("overwrite").parquet(f"{store_dir}/stats/batch=-1")
    lits.select("lit").write.mode("overwrite").parquet(f"{store_dir}/seen/batch=-1")
    postings.unpersist()
    doc_len.unpersist()
    lits.unpersist()


def compact_fts_store(spark: SparkSession, store_dir: str, force: bool = False) -> dict:
    """Fold all ``batch=*`` segments of an incremental FTS store into
    one ``batch=-1`` segment per sub-store.

    ``read_incremental_fts`` unions segment directories lazily — correct
    at any segment count, but after thousands of micro-batches every
    bucket holds thousands of parquet dirs and the per-query token_df
    re-aggregation grows with segment count. This is the same periodic
    maintenance job ``compact_store`` is for the quad log: postings are
    re-bucketed into one partitioned segment, token document-frequencies
    pre-summed, corpus stats folded to one row, and the seen-log
    deduplicated — BM25 scores are unchanged (verified in tests) and
    bucket pruning is preserved. Post-compaction micro-batches (ids
    >= 0) append next to ``batch=-1`` exactly as after a bootstrap.

    Refuses when a ``_manifest`` directory pins pre-compaction segment
    files (same guard as ``compact_store``) unless ``force=True``."""
    import os
    import shutil

    from .manifest import versions

    if versions(store_dir) and not force:
        raise RuntimeError(
            "FTS store has snapshot manifests pinning pre-compaction "
            "segments; compacting would break every committed version. "
            "Vacuum/drop the snapshots first, or pass force=True."
        )
    meta = spark.read.parquet(f"{store_dir}/meta").collect()[0]
    num_buckets = int(meta["num_buckets"])
    postings = spark.read.parquet(f"{store_dir}/postings").drop("batch")
    token_df = (
        spark.read.parquet(f"{store_dir}/token_df")
        .groupBy("bucket", "token")
        .agg(F.sum("df").alias("df"))
    )
    doc_len = _read_log(spark, f"{store_dir}/doc_len")
    stats = _read_log(spark, f"{store_dir}/stats").agg(
        F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n_docs"),
        F.coalesce(F.sum("sum_dl"), F.lit(0)).alias("sum_dl"),
    )
    seen = _read_log(spark, f"{store_dir}/seen").distinct()

    tmp = f"{store_dir}/_compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    if "dl" not in postings.columns:
        # pre-norms-in-postings store: the compaction rewrite is the
        # natural moment to upgrade the layout (doc_len segments are
        # disjoint by lit — the seen-log indexed each literal once)
        postings = postings.join(doc_len.select("lit", "dl"), "lit")
    (
        postings.drop("bucket")
        .withColumn("bucket", _token_bucket_col(F.col("token"), num_buckets))
        .repartition("bucket")
        .sortWithinPartitions("token")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{tmp}/postings/batch=-1")
    )
    (
        token_df.repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{tmp}/token_df/batch=-1")
    )
    doc_len.write.mode("overwrite").parquet(f"{tmp}/doc_len/batch=-1")
    stats.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/stats/batch=-1")
    seen.write.mode("overwrite").parquet(f"{tmp}/seen/batch=-1")
    n_docs = spark.read.parquet(f"{tmp}/doc_len").count()
    n_postings = spark.read.parquet(f"{tmp}/postings").count()

    for sub in ("postings", "token_df", "doc_len", "stats", "seen"):
        shutil.rmtree(f"{store_dir}/{sub}", ignore_errors=True)
        os.rename(f"{tmp}/{sub}", f"{store_dir}/{sub}")
    shutil.rmtree(tmp, ignore_errors=True)
    return {"n_docs": n_docs, "postings": n_postings, "segments": 1}


def read_incremental_fts(spark: SparkSession, store_dir: str) -> FtsIndex:
    """Open the incrementally-maintained store as a regular FtsIndex.
    Segment recombination is lazy and filter-friendly: a query's bucket
    pruning + token filter reach the parquet scans below the df-sum."""
    meta = spark.read.parquet(f"{store_dir}/meta").collect()[0]
    postings = _read_log(spark, f"{store_dir}/postings")
    token_df = (
        _read_log(spark, f"{store_dir}/token_df")
        .groupBy("bucket", "token")
        .agg(F.sum("df").alias("df"))
    )
    doc_len = _read_log(spark, f"{store_dir}/doc_len")
    stats = (
        _read_log(spark, f"{store_dir}/stats")
        .agg(F.sum("n_docs").alias("n"), F.sum("sum_dl").alias("s"))
        .collect()[0]
    )
    n_docs = int(stats["n"] or 0)
    avgdl = (stats["s"] / n_docs) if n_docs else 1.0
    return FtsIndex(
        postings=postings,
        token_df=token_df,
        doc_len=doc_len,
        n_docs=n_docs,
        avgdl=float(avgdl),
        num_buckets=int(meta["num_buckets"]),
        stem=bool(meta["stem"]),
        strip=bool(meta["strip"]),
    )
