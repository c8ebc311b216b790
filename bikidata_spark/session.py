"""SparkSession factory tuned for the bikidata-spark engine.

Local testing runs on ``local[N]``; the same settings (AQE, adaptive
coalescing, Arrow) are the ones we'd ship to a real cluster — only
``master`` and memory sizing change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def ensure_parallelism(df, min_partitions: int | None = None):
    """Fan a tiny input out to the session's parallelism.

    A small parquet table arrives as ONE split, which would serialize
    every expression-heavy operator downstream (shingling, hashing,
    vector math) on a single core. At production scale inputs arrive in
    hundreds of splits and this is a no-op — we never repartition DOWN,
    so no shuffle is added where the source is already parallel.

    Partition-count introspection goes through the JVM query execution
    (no ``df.rdd``, which would build a Python RDD wrapper and force a
    plan conversion per call); anything unavailable — e.g. under Spark
    Connect, where there is no SparkContext — degrades to returning the
    DataFrame untouched rather than failing."""
    try:
        target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
        n = df._jdf.queryExecution().toRdd().getNumPartitions()
    except Exception:  # Spark Connect / remote session: no JVM handle
        return df if min_partitions is None else df.repartition(min_partitions)
    if n < target:
        return df.repartition(target)
    return df


def get_spark(app_name: str = "bikidata-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE size CACHED plans' partitioning to the data too: a
        # dictionary table cached through a 32-partition shuffle at
        # small scale otherwise pins 32 near-empty partitions, and every
        # point-query scan pays 32 task launches for kilobytes of work;
        # at cluster scale the same setting leaves genuinely large
        # caches wide, so it is sizing, not shrinking
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        # evaluate LIMIT over all partitions in one job: the default
        # try-1-partition-then-scale-up loop costs one scheduler
        # round-trip per escalation, which dominates point-query
        # latency (the engine's limits sit over already-filtered,
        # partition-pruned frames, so the all-at-once scan is cheap)
        .config("spark.sql.limit.initialNumPartitions", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        # FAIR lets concurrent served queries round-robin executor slots
        # instead of FIFO head-of-line blocking (Serving sets a pool per
        # worker thread); FIFO remains the default for batch workloads
        .config("spark.scheduler.mode", os.environ.get("BIKIDATA_SPARK_SCHEDULER", "FIFO"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("BIKIDATA_SPARK_DRIVER_MEM", "8g"))
        # the tier build is the engine's one cap-bounded collect
        # (build_local_tier: bounded probes, then toPandas/toArrow);
        # deployments raising BIKIDATA_SPARK_LOCAL_TIER_BYTES (default
        # 2 GiB ≈ a 26M-quad row fence) past ~2.5 GiB push that collect
        # over Spark's 1g default result-size fence, so size the fence
        # with the budget (4g covers a 64M-quad mirror)
        .config(
            "spark.driver.maxResultSize",
            os.environ.get("BIKIDATA_SPARK_MAX_RESULT", "4g"),
        )
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
