"""Event-stream analytics (batch form; streaming twins live in
bikidata_spark/streaming/).

Sums over doubles use DECIMAL(18,6) so aggregation is associative-exact
and independent of partition merge order — a requirement for
reproducible results on a cluster (double summation order varies with
partitioning) and for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from ..session import ensure_parallelism


def hourly_agg(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour aggregate per event_type:
    (hour, event_type, n, total)."""
    events = ensure_parallelism(events)
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("total"),
        )
    )


def json_prop_sum(events: DataFrame, json_col: str = "props", key: str = "k") -> DataFrame:
    """Extract a JSON integer property and sum per event_type."""
    events = ensure_parallelism(events)
    return (
        events.groupBy("event_type")
        .agg(
            F.sum(F.get_json_object(F.col(json_col), f"$.{key}").cast("long")).alias("k_sum"),
            F.count("*").alias("n"),
        )
    )


def topk_users(events: DataFrame, k: int = 3) -> DataFrame:
    """Top-k users by event count per event_type (ties → lower user_id):
    (event_type, user_id, n_events, rank)."""
    events = ensure_parallelism(events)
    counts = events.groupBy("event_type", "user_id").agg(F.count("*").alias("n_events"))
    w = Window.partitionBy("event_type").orderBy(
        F.col("n_events").desc(), F.col("user_id").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("event_type", "user_id", "n_events", F.col("rank").cast("int").alias("rank"))
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization per user: a new session starts when the
    time since the previous event exceeds the gap.
    (user_id, session_id, n_events, session_start).

    Batch twin of the streaming stateful operator; one window pass
    (partition by user), integer session ids — deterministic."""
    events = ensure_parallelism(events)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = F.lit(gap_minutes * 60)
    with_prev = events.withColumn("prev_ts", F.lag("ts").over(w))
    new_sess = (
        F.col("prev_ts").isNull()
        | (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts") > gap)
    ).cast("int")
    with_sess = with_prev.withColumn("session_id", F.sum(new_sess).over(w))
    return (
        with_sess.groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"), F.min("ts").alias("session_start"))
        .select("user_id", F.col("session_id").cast("long").alias("session_id"), "n_events", "session_start")
    )
