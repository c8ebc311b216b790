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


def to_event_frame(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize the event-time column to session-tz TIMESTAMP whatever
    the source encoding. The upstream parquet has shipped three shapes
    so far — TIMESTAMP(NANOS) (readable only as long via
    ``spark.sql.legacy.parquet.nanosAsLong``), ``timestamp[us]`` (read
    as TIMESTAMP_NTZ by pyspark 4), and plain TIMESTAMP — so every
    events operator funnels through this dtype-branching guard instead
    of assuming one historical encoding.

    The NTZ→TZ cast is an exact relabel under the engine's fixed UTC
    session timezone (session.py pins ``spark.sql.session.timeZone``);
    the long branch assumes nanos, the only integer encoding the data
    has ever used."""
    dtype = dict(df.dtypes).get(ts_col)
    if dtype in ("bigint", "long"):
        df = df.withColumn(ts_col, F.timestamp_micros(F.expr(f"`{ts_col}` div 1000")))
    elif dtype == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def hourly_agg(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour aggregate per event_type:
    (hour, event_type, n, total)."""
    events = ensure_parallelism(to_event_frame(events))
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
    events = ensure_parallelism(to_event_frame(events))
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # build the microsecond threshold in PYTHON so the literal is a
    # LongType: a Spark-side int32 multiply would wrap for gaps >= 36min
    gap_us = F.lit(int(gap_minutes) * 60 * 1_000_000)
    with_prev = events.withColumn("prev_ts", F.lag("ts").over(w))
    new_sess = (
        F.col("prev_ts").isNull()
        | (F.unix_micros("ts") - F.unix_micros("prev_ts") > gap_us)
    ).cast("int")
    with_sess = with_prev.withColumn("session_id", F.sum(new_sess).over(w))
    return (
        with_sess.groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n_events"), F.min("ts").alias("session_start"))
        .select("user_id", F.col("session_id").cast("long").alias("session_id"), "n_events", "session_start")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """As-of join: for every left row, the single right row with the
    greatest ``right.on <= left.on`` within the same ``by`` group
    (left rows with no prior right row keep nulls).

    Spark lacks this operator; the scalable formulation is the classic
    merge pattern — tag both sides, union, ONE sort-shuffle on
    (by, on), and carry the latest right payload forward with
    ``last(ignorenulls)`` over an ordered window. No per-row Python,
    no range-join explosion; cost is a single repartition+sort of
    |L|+|R| rows, the same shape a 1000-executor cluster wants.

    Determinism: right rows are first reduced to one per (by, on) —
    the max-id row — because "the" as-of match is otherwise arbitrary
    among equal timestamps (DuckDB's ASOF JOIN has the same caveat).
    Ties between a left and right row at the SAME timestamp match
    (inclusive <=), mirroring DuckDB.
    """
    # NTZ on either side would poison the union dtype; numeric on-cols
    # pass through untouched (to_event_frame's long branch is only for
    # the canonical events table, not generic keys)
    if dict(left.dtypes).get(on) == "timestamp_ntz":
        left = left.withColumn(on, F.col(on).cast("timestamp"))
    if dict(right.dtypes).get(on) == "timestamp_ntz":
        right = right.withColumn(on, F.col(on).cast("timestamp"))
    right_cols = right_cols or [c for c in right.columns if c not in (on, by)]
    rid = F.row_number().over(
        Window.partitionBy(by, on).orderBy(*[F.col(c).desc() for c in right.columns])
    )
    r1 = right.withColumn("_rn", rid).filter(F.col("_rn") == 1).drop("_rn")

    lcols = left.columns
    l_tagged = left.select(
        F.col(by), F.col(on), F.lit(1).alias("_side"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols if c not in (by, on)],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in right_cols],
    )
    r_tagged = r1.select(
        F.col(by), F.col(on), F.lit(0).alias("_side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(f"_l_{c}") for c in lcols if c not in (by, on)],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    # right rows sort before left rows at equal `on` (inclusive match)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        F.col(by), F.col(on), F.col("_side"),
        *[F.col(f"_l_{c}") for c in lcols if c not in (by, on)],
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}") for c in right_cols],
    )
    return carried.filter(F.col("_side") == 1).select(
        F.col(by), F.col(on),
        *[F.col(f"_l_{c}").alias(c) for c in lcols if c not in (by, on)],
        *[F.col(f"{c}{suffix}") for c in right_cols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point: str = "pt",
    lower: str = "lo",
    upper: str = "hi",
    bucket_width: int = 60_000_000,
) -> DataFrame:
    """Interval join: every (point, interval) pair with
    ``lower <= point < upper``, both sides numeric (convert timestamps
    to epoch integers first).

    A naive inequality join plans as a nested-loop cross product —
    unusable at scale. This decomposes the number line into
    ``bucket_width`` buckets: points map to ONE bucket, intervals
    explode to the buckets they overlap, and the pair space shrinks to
    an equi-join on bucket followed by the exact range filter. Cost is
    |P| + |I|·(avg interval width / bucket_width) shuffled rows — pick
    ``bucket_width`` near the typical interval length so intervals
    explode to O(1) buckets each."""
    p = points.withColumn("_bk", F.floor(F.col(point) / bucket_width))
    iv = intervals.withColumn(
        "_bk",
        F.explode(
            F.sequence(
                F.floor(F.col(lower) / bucket_width),
                # upper is exclusive: a point in [hi, bucket-end) can't match
                F.floor((F.col(upper) - 1) / bucket_width),
            )
        ),
    )
    return (
        p.join(iv, "_bk")
        .filter((F.col(point) >= F.col(lower)) & (F.col(point) < F.col(upper)))
        .drop("_bk")
    )


def funnel(
    events: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
) -> DataFrame:
    """Ordered-funnel completion per user: (user_id, t1..tn) where t1 is
    the user's earliest ``stages[0]`` event and each t(i+1) is the
    earliest ``stages[i]`` event strictly after t(i); only users who
    complete every stage appear (the standard product-analytics funnel,
    greedy-earliest semantics).

    Plan shape: one groupBy per stage, all keyed by user_id — after the
    first shuffle the data is hash-partitioned by user and every later
    join and groupBy reuses that partitioning (subset-clustering), so a
    k-stage funnel costs one real shuffle plus k partition-local
    reductions, not k shuffles."""
    events = ensure_parallelism(to_event_frame(events))
    cur = (
        events.filter(F.col("event_type") == stages[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    for i, st in enumerate(stages[1:], start=2):
        nxt = events.filter(F.col("event_type") == st).select("user_id", "ts")
        prev_cols = [f"t{j}" for j in range(1, i)]
        cur = (
            nxt.join(cur, "user_id")
            .filter(F.col("ts") > F.col(f"t{i-1}"))
            .groupBy("user_id", *prev_cols)
            .agg(F.min("ts").alias(f"t{i}"))
        )
    return cur.select("user_id", *[f"t{j}" for j in range(1, len(stages) + 1)])
