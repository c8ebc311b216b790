"""Structured-Streaming ingest for the quad store.

Reference counterpart: the Redis-queued async insert/delete workers
(reference workers.py:23-128). The Spark-native equivalent of a durable
mutation queue is a file/stream source + Structured Streaming:
mutations arrive as JSON lines {action, s, p, o, g}, and each
micro-batch appends to the store:

- inserts  → append to ``{store}/triples`` and ``{store}/terms``
- deletes  → append to ``{store}/tombstones``

The store stays append-only (object-store friendly; no rewrite of
existing files); ``read_store`` reconciles tombstones with an anti-join
at load time — the classic log-structured design, and the only shape
that scales to 100 TB on an append-only filesystem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import Graph, term_hash

MUTATION_SCHEMA = "action string, s string, p string, o string, g string"


def read_mutation_stream(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of JSON mutation records. This is the ONE
    reader definition every ingest path shares — journal replay passes
    ``max_files_per_trigger=1`` so each journal file becomes its own
    micro-batch (strict mutation order)."""
    reader = spark.readStream.schema(MUTATION_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(src_dir)


def _hashed(quads: DataFrame) -> DataFrame:
    return quads.select(
        term_hash("s").alias("s"),
        term_hash("p").alias("p"),
        term_hash("o").alias("o"),
        term_hash(F.coalesce("g", F.lit(""))).alias("g"),
    )


def _terms(quads: DataFrame) -> DataFrame:
    return (
        quads.select(F.col("s").alias("value"))
        .unionAll(quads.select("p"))
        .unionAll(quads.select("o"))
        .unionAll(quads.select(F.coalesce("g", F.lit("")).alias("g")))
        .distinct()
        .select(
            term_hash("value").alias("hash"),
            "value",
            F.col("value").startswith('"').alias("is_literal"),
        )
    )


def start_ingest(
    spark: SparkSession,
    src_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start the mutation-ingest stream. Each micro-batch routes
    inserts/deletes to their append-only directories via foreachBatch.

    Idempotence is REAL, not just checkpoint-deep: every write lands in
    a batch-id-derived subdirectory (``.../batch=<id>``) with overwrite
    mode, so a micro-batch retried after a partial failure (e.g. crash
    between the triples append and the terms append) REPLACES its own
    partial output instead of appending duplicates.

    Ordering: tombstones are SEQUENCED by batch id (read_store applies
    a tombstone only to quads from its own or earlier batches, so a
    later re-insert resurrects the quad — real LSM semantics). Records
    WITHIN one micro-batch have no order; when replaying a serving
    journal (one file per mutation, strict order required), pass
    ``max_files_per_trigger=1`` so each journal file is its own
    batch."""
    stream = read_mutation_stream(spark, src_dir, max_files_per_trigger)

    def process(batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        inserts = batch.filter(F.col("action") == "insert")
        # delete record forms (Serving's journal writes all three):
        #   action=delete, o set      → exact (s,p,o,g) tombstone
        #   action=delete, o missing  → WILDCARD (s,p,g) tombstone
        #   action=delete_hashes      → columns carry decimal term
        #     hashes (reference are_hashes, query.py:476-520); empty o
        #     = wildcard, empty g = the default graph's hash
        no_o = F.col("o").isNull() | (F.col("o") == "")
        lex_del = batch.filter(F.col("action") == "delete")
        hash_del = batch.filter(F.col("action") == "delete_hashes")
        empty_g_hash = F.xxhash64(F.lit(""))
        h_g = F.when(
            F.col("g").isNull() | (F.col("g") == ""), empty_g_hash
        ).otherwise(F.col("g").cast("long"))
        exact = _hashed(lex_del.filter(~no_o)).unionAll(
            hash_del.filter(~no_o).select(
                F.col("s").cast("long").alias("s"),
                F.col("p").cast("long").alias("p"),
                F.col("o").cast("long").alias("o"),
                h_g.alias("g"),
            )
        )
        wild = lex_del.filter(no_o).select(
            term_hash("s").alias("s"),
            term_hash("p").alias("p"),
            term_hash(F.coalesce("g", F.lit(""))).alias("g"),
        ).unionAll(
            hash_del.filter(no_o).select(
                F.col("s").cast("long").alias("s"),
                F.col("p").cast("long").alias("p"),
                h_g.alias("g"),
            )
        )
        if inserts.limit(1).count():
            _hashed(inserts).write.mode("overwrite").parquet(
                f"{store_dir}/triples/batch={batch_id}"
            )
            _terms(inserts).write.mode("overwrite").parquet(
                f"{store_dir}/terms/batch={batch_id}"
            )
        if exact.limit(1).count():
            exact.write.mode("overwrite").parquet(
                f"{store_dir}/tombstones/batch={batch_id}"
            )
        if wild.limit(1).count():
            wild.write.mode("overwrite").parquet(
                f"{store_dir}/tombstones_spg/batch={batch_id}"
            )
        batch.unpersist()

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def replay_journal(
    spark: SparkSession,
    journal_dir: str,
    store_dir: str,
    checkpoint_dir: str | None = None,
):
    """Rebuild a log-structured store from a serving journal, including
    its ROTATED prefix: a long-lived ``Serving(journal_dir=...,
    journal_rotate_files=N)`` periodically folds its oldest journal
    files into ``{journal_dir}/_compacted`` (a log-structured store) and
    deletes them, so the raw file list no longer covers history. Replay
    therefore seeds the target store with the compacted net state as its
    OLDEST segment (``batch=-1`` — every live journal file replays after
    it, ids >= 0, so sequenced-tombstone ordering holds), then streams
    the remaining journal files one-per-batch.

    Safe against a crash mid-rotation (files ingested into _compacted
    but not yet deleted): the suffix double-applies, and sequenced
    last-writer-wins semantics make ``apply(S); apply(S)`` converge to
    ``apply(S)`` — pinned by test_journal_replay. Returns the streaming
    query (await it, then ``read_store(store_dir)``)."""
    import os

    comp = f"{journal_dir}/_compacted"
    if os.path.isdir(f"{comp}/triples"):
        g = read_store(spark, comp)
        g.triples.write.mode("overwrite").parquet(f"{store_dir}/triples/batch=-1")
        g.terms.write.mode("overwrite").parquet(f"{store_dir}/terms/batch=-1")
    return start_ingest(
        spark,
        journal_dir,
        store_dir,
        checkpoint_dir or f"{store_dir}/_replay_checkpoint",
        max_files_per_trigger=1,
    )


def compact_store(spark: SparkSession, store_dir: str, force: bool = False) -> dict:
    """Fold the append-only log down: apply tombstones, drop duplicate
    quads and term rows, rewrite triples sorted by (p, s) (row-group
    pruning for property lookups), and truncate the tombstone log.

    This is the periodic maintenance job of every log-structured design
    (LSM compaction): reads stay fast because the anti-join against an
    ever-growing tombstone set is paid once here instead of on every
    load. Safe ordering: the compacted store is fully written to a
    sibling directory before the old directories are swapped out.

    Snapshot manifests (``streaming.manifest``) pin data files by
    relative path, so compaction would leave every committed version
    unreadable — it therefore REFUSES when a ``_manifest`` directory
    exists unless ``force=True`` (after which old snapshots are gone;
    vacuum or re-snapshot deliberately)."""
    import os
    import shutil

    from .manifest import versions

    if versions(store_dir) and not force:
        raise RuntimeError(
            "store has snapshot manifests pinning pre-compaction files; "
            "compacting would break every committed version. Vacuum/drop "
            "the snapshots first, or pass force=True to discard them."
        )
    resolved = read_store(spark, store_dir)
    tmp = f"{store_dir}/_compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    # compacted output lives under batch=-1 so the directory layout
    # stays uniformly partitioned when post-compaction micro-batches
    # (ids are monotonically >= 0) add their own batch dirs next to it
    (
        resolved.triples.repartition("p")
        .sortWithinPartitions("p", "s")
        .write.mode("overwrite")
        .parquet(f"{tmp}/triples/batch=-1")
    )
    resolved.terms.write.mode("overwrite").parquet(f"{tmp}/terms/batch=-1")
    n_triples = spark.read.parquet(f"{tmp}/triples").count()
    n_terms = spark.read.parquet(f"{tmp}/terms").count()

    for sub in ("triples", "terms", "tombstones", "tombstones_spg"):
        shutil.rmtree(f"{store_dir}/{sub}", ignore_errors=True)
    for sub in ("triples", "terms"):
        os.rename(f"{tmp}/{sub}", f"{store_dir}/{sub}")
    shutil.rmtree(tmp, ignore_errors=True)
    return {"triples": n_triples, "terms": n_terms}


def _read_log(spark: SparkSession, path: str) -> DataFrame:
    """Read an append-only log directory, dropping the ``batch``
    partition column the idempotent per-batch writers add."""
    df = spark.read.parquet(path)
    return df.drop("batch") if "batch" in df.columns else df


def _read_log_excluding(spark: SparkSession, path: str, batch_id: int) -> DataFrame:
    """Read an append-only log directory EXCLUDING one batch's segment.

    The seen-log anti-join inside a foreachBatch must never see the
    current batch's own prior output: if batch N is replayed (crash
    after the seen write but before the checkpoint commit, or re-ingest
    with a fresh checkpoint), reading the full log would anti-join the
    replayed rows to empty and overwrite every ``batch=N`` segment with
    empty data — permanently dropping those rows. Excluding
    ``batch == batch_id`` makes the replay regenerate the identical
    segment instead. The filter is on the partition column, so pruning
    skips the excluded directory entirely."""
    df = spark.read.parquet(path)
    if "batch" in df.columns:
        df = df.filter(F.col("batch") != F.lit(batch_id)).drop("batch")
    return df


def _read_log_with_batch(spark: SparkSession, path: str) -> DataFrame:
    """Read an append-only log keeping the batch id as ``_b`` (missing
    on pre-partitioned legacy segments → -1, 'oldest')."""
    df = spark.read.parquet(path)
    if "batch" in df.columns:
        return df.withColumn("_b", F.col("batch").cast("long")).drop("batch")
    return df.withColumn("_b", F.lit(-1).cast("long"))


def resolve_triples(
    triples_b: DataFrame, tomb_b: DataFrame | None, wild_b: DataFrame | None
) -> DataFrame:
    """Apply SEQUENCED tombstones to a batch-stamped quad log (every
    frame carries ``_b``): an exact (s,p,o,g) or wildcard (s,p,g)
    tombstone from batch B kills only quad rows from batches <= B, so
    re-inserting a deleted quad in a later batch resurrects it (LSM
    semantics — without the sequencing, a serving journal replaying
    insert → delete → insert would lose the final insert). Returns the
    live (s, p, o, g) set."""
    triples = triples_b.dropDuplicates(["s", "p", "o", "g", "_b"])
    if tomb_b is not None:
        t, tb = triples.alias("t"), tomb_b.alias("tb")
        triples = t.join(
            tb,
            (F.col("t.s") == F.col("tb.s"))
            & (F.col("t.p") == F.col("tb.p"))
            & (F.col("t.o") == F.col("tb.o"))
            & (F.col("t.g") == F.col("tb.g"))
            & (F.col("tb._b") >= F.col("t._b")),
            "left_anti",
        )
    if wild_b is not None:
        t, tw = triples.alias("t"), wild_b.alias("tw")
        triples = t.join(
            tw,
            (F.col("t.s") == F.col("tw.s"))
            & (F.col("t.p") == F.col("tw.p"))
            & (F.col("t.g") == F.col("tw.g"))
            & (F.col("tw._b") >= F.col("t._b")),
            "left_anti",
        )
    return triples.select("s", "p", "o", "g").distinct()


def read_store(spark: SparkSession, store_dir: str) -> Graph:
    """Load the log-structured store as a Graph: distinct quads minus
    sequenced tombstones (see resolve_triples), deduplicated terms."""
    triples_b = _read_log_with_batch(spark, f"{store_dir}/triples")

    def opt(path):
        try:
            df = _read_log_with_batch(spark, path)
            df.schema  # force resolution; missing dir raises here
            return df
        except Exception:
            return None

    triples = resolve_triples(
        triples_b,
        opt(f"{store_dir}/tombstones"),
        opt(f"{store_dir}/tombstones_spg"),
    )
    terms = (
        _read_log(spark, f"{store_dir}/terms")
        .groupBy("hash")
        .agg(F.first("value").alias("value"), F.first("is_literal").alias("is_literal"))
    )
    return Graph(triples=triples, terms=terms)


DOC_SCHEMA = "doc_id long, text string"


def start_dedup_ingest(
    spark: SparkSession,
    src_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Streaming exact-dedup ingest for a document corpus: each
    micro-batch keeps only documents whose normalized fingerprint
    (md5 of the token stream — ``functions.text.fingerprint``) is new
    BOTH within the batch (min doc_id survives) and against everything
    already ingested, then appends the survivors and their fingerprints
    to the store.

    The seen-set lives in the store itself (``{store}/fps`` parquet),
    not in driver memory — so state scales to corpus size, restarts
    recover it for free, and the per-batch cost is one anti-join against
    a hash-partitioned column. Writes land in batch-id-derived
    subdirectories with overwrite mode, so a retried micro-batch
    replaces its own partial output instead of appending duplicates
    (idempotent even when a crash splits the docs/fps append pair)."""
    from pyspark.sql import Window

    from ..functions.text import fingerprint

    stream = spark.readStream.schema(DOC_SCHEMA).json(src_dir)

    def process(batch: DataFrame, batch_id: int) -> None:
        fps = fingerprint(batch, "doc_id", "text")
        w = Window.partitionBy("fp").orderBy(F.col("doc_id").asc())
        in_batch = (
            batch.join(fps, "doc_id")
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        try:
            # exclude this batch's own segment so a REPLAYED batch
            # regenerates identical output instead of anti-joining
            # against its prior self and writing empty segments
            seen = _read_log_excluding(spark, f"{store_dir}/fps", batch_id)
            fresh = in_batch.join(seen, "fp", "left_anti")
        except Exception:
            fresh = in_batch  # first batch: nothing seen yet
        fresh = fresh.persist()
        fresh.select("doc_id", "text").write.mode("overwrite").parquet(
            f"{store_dir}/docs/batch={batch_id}"
        )
        fresh.select("fp").distinct().write.mode("overwrite").parquet(
            f"{store_dir}/fps/batch={batch_id}"
        )
        fresh.unpersist()

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
