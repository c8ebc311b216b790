"""Structured-Streaming twins of the batch event operators
(bikidata_spark/operators/events.py).

Late data is handled with watermarks; sessionization uses Spark's
built-in ``session_window`` (state-store backed, scales per key across
executors) instead of a hand-rolled stateful operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def read_event_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    return spark.readStream.schema(EVENT_SCHEMA).json(src_dir)


def hourly_agg_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming tumbling 1-hour aggregate per event_type. Watermark
    bounds state: windows older than the watermark are finalized and
    evicted."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("total"),
        )
        .select(F.col("w.start").alias("hour"), "event_type", "n", "total")
    )


def sessionize_stream(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming gap-based sessionization per user via the built-in
    session window (merges events closer than the gap)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", f"{gap_minutes} minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def run_to_memory(stream_df: DataFrame, query_name: str):
    """Drain an availableNow stream into an in-memory table (tests)."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )


def funnel_stream(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    watermark: str = "2 hours",
) -> DataFrame:
    """Stateful streaming funnel detector: emits (user_id, completed_at)
    the micro-batch a user's events first advance through every stage in
    order. Built-in windowed aggs can't express cross-event ORDERED
    progression, so this is the one genuinely custom stateful operator —
    ``applyInPandasWithState`` with a single int of state (the furthest
    stage reached) per user. State is O(1) per key and Arrow-batched;
    events are processed ts-ordered within each micro-batch (cross-batch
    stragglers older than the watermark are dropped by Spark)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    n_stages = len(stages)

    def detect(key, pdfs, state):
        stage = state.get[0] if state.exists else 0
        done_at = None
        for pdf in pdfs:
            for ts, et in sorted(zip(pdf["ts"], pdf["event_type"])):
                if stage < n_stages and et == stages[stage]:
                    stage += 1
                    if stage == n_stages:
                        done_at = ts
        state.update((stage,))
        if done_at is not None:
            yield pd.DataFrame({"user_id": [key[0]], "completed_at": [done_at]})

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            detect,
            "user_id long, completed_at timestamp",
            "stage int",
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
