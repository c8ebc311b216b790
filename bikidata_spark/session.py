"""SparkSession factory tuned for the bikidata-spark engine.

Local testing runs on ``local[N]``; the same settings (AQE, adaptive
coalescing, Arrow) are the ones we'd ship to a real cluster — only
``master`` and memory sizing change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _fanout_bytes() -> int:
    """Bytes of (optimizer-estimated) input per fan-out partition.

    Env-tunable so deployments can match it to their operators'
    compute density; the default is sized for the expression-heavy
    operators that call :func:`ensure_parallelism` (shingling,
    hashing, vector math — 10-100x work amplification per input
    byte), measured at the knee of the r14 fan-out sweep
    (docs/BENCH_NOTES.md)."""
    return max(1, int(os.environ.get("BIKIDATA_SPARK_FANOUT_BYTES", str(256 << 10))))


def ensure_parallelism(df, min_partitions: int | None = None, density: int = 1):
    """Fan a tiny input out toward the session's parallelism, sized by
    the DATA rather than the core count (guide §2.2/§6).

    A small parquet table arrives as ONE split, which would serialize
    every expression-heavy operator downstream (shingling, hashing,
    vector math) on a single core. At production scale inputs arrive in
    hundreds of splits and this is a no-op — we never repartition DOWN,
    so no shuffle is added where the source is already parallel.

    The fan-out TARGET is one partition per ``BIKIDATA_SPARK_FANOUT_BYTES``
    of the optimizer's size estimate, capped at the session's
    ``defaultParallelism`` (r14; was unconditionally
    ``defaultParallelism``). The old constant round-robined a 0.6 MB
    table into 32 partitions on a 32-core session, and every
    downstream stage then paid 32 task launches for kilobytes of work
    per task — the bench's fan-out-heavy sections measured ~3x slower
    at local[32] than local[8] on identical sf0.1 data. Deriving the
    width from the estimated bytes keeps the fan-out identical at
    every core count below the cap (scaling runs measure the engine,
    not a fan-out constant) and converges to exactly the old behavior
    wherever the input is big enough to use every core — so cluster
    deployments see no change. An unavailable or unparseable estimate
    falls back to the core count (the pre-r14 width, never narrower).

    ``density`` (r15) is the per-operator compute-density hint: an
    operator doing ``density``× the default work per input byte
    divides the byte target by it, widening ITS fan-out without
    moving the global default (one knob cannot fit operators with
    10-100× different work per byte — VERDICT r14 item 2; the
    interleaved q_ann_ivf A/B measured the 256 KiB default costing
    the IVF assignment fold ~15% vs full width, while the sweep knee
    for the cheap operators sits exactly at 256 KiB). The
    ``defaultParallelism`` cap still binds, so cluster-scale behavior
    is unchanged.

    Partition-count introspection goes through the JVM query execution
    (no ``df.rdd``, which would build a Python RDD wrapper and force a
    plan conversion per call); anything unavailable — e.g. under Spark
    Connect, where there is no SparkContext — degrades to returning the
    DataFrame untouched rather than failing."""
    if min_partitions is not None and min_partitions < 1:
        # 0 used to mean "full width" via `or defaultParallelism`; the
        # r14 `is not None` check silently changed it to "never
        # repartition". No caller passes it — reject instead of
        # guessing which meaning was intended (ADVICE r14).
        raise ValueError(f"min_partitions must be >= 1, got {min_partitions}")
    try:
        cores = df.sparkSession.sparkContext.defaultParallelism
        qe = df._jdf.queryExecution()
        n = qe.toRdd().getNumPartitions()
    except Exception:  # Spark Connect / remote session: no JVM handle
        return df if min_partitions is None else df.repartition(min_partitions)
    if min_partitions is not None:
        target = min_partitions
    else:
        target = cores
        try:
            est = int(str(qe.optimizedPlan().stats().sizeInBytes()))
            if est > 0:
                per_part = max(1, _fanout_bytes() // max(1, density))
                target = min(cores, -(-est // per_part))
        except Exception:
            pass  # no estimate: keep the conservative full-width fan-out
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
