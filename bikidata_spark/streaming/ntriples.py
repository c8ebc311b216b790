"""Streaming N-Triples ingest: the same JVM string-slicing parse as
the batch reader (sources/ntriples.py) over a file-source text stream
— drop a dump shard into the directory and it becomes quads in the
store.

This is the Spark-native form of the reference's continuous-ingest
story (scripts/index.py feeds a queue of workers): Structured Streaming
gives exactly-once file tracking via the checkpoint instead of a
hand-rolled queue."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import term_hash
from ..sources.ntriples import parse_nt_lines


def read_nt_stream(spark: SparkSession, src_dir: str, graph: str = "") -> DataFrame:
    """Identical parse plan to the batch reader — parse_nt_lines is
    stateless expressions + a repartition, so it composes with
    readStream (each micro-batch fans its gzip shards out)."""
    lines = spark.readStream.text(src_dir)
    fan_out = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return parse_nt_lines(lines, fan_out=fan_out).withColumn("g", F.lit(graph))


def start_nt_ingest(
    spark: SparkSession,
    src_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    graph: str = "",
    trigger_available_now: bool = True,
):
    """Parse + hash + append each micro-batch into the log-structured
    store (read back with streaming.mutations.read_store). Writes land
    in batch-id-derived subdirectories with overwrite mode so a retried
    micro-batch replaces its own partial output (idempotent even when a
    crash splits the triples/terms append pair)."""
    stream = read_nt_stream(spark, src_dir, graph)

    def process(batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        batch.select(
            term_hash("s").alias("s"),
            term_hash("p").alias("p"),
            term_hash("o").alias("o"),
            term_hash("g").alias("g"),
        ).write.mode("overwrite").parquet(f"{store_dir}/triples/batch={batch_id}")
        (
            batch.select(F.explode(F.array("s", "p", "o", "g")).alias("value"))
            .distinct()
            .select(
                term_hash("value").alias("hash"),
                "value",
                F.col("value").startswith('"').alias("is_literal"),
            )
            .write.mode("overwrite")
            .parquet(f"{store_dir}/terms/batch={batch_id}")
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
