"""Pins for the r14 size-adaptive fan-out (session.ensure_parallelism).

The fan-out width derives from the optimizer's size estimate (one
partition per BIKIDATA_SPARK_FANOUT_BYTES) capped at the session's
defaultParallelism, instead of the pre-r14 unconditional
defaultParallelism. These tests pin the three behaviors the change
relies on: the control setting reproduces the old width, the width
never exceeds the cap, and operator results are invariant to the
width (the declared-query contract)."""

from __future__ import annotations

import os

from bikidata_spark.operators import dedup as dd
from bikidata_spark.session import ensure_parallelism


def _nparts(df) -> int:
    return df._jdf.queryExecution().toRdd().getNumPartitions()


def test_fanout_width_derives_from_size(spark, docs):
    cores = spark.sparkContext.defaultParallelism
    try:
        # control: a 1-byte per-partition target saturates the cap —
        # exactly the pre-r14 full-width fan-out
        os.environ["BIKIDATA_SPARK_FANOUT_BYTES"] = "1"
        assert _nparts(ensure_parallelism(docs)) == cores
        # a huge target leaves the tiny input untouched: no shuffle at
        # all where the data does not justify one
        os.environ["BIKIDATA_SPARK_FANOUT_BYTES"] = str(1 << 40)
        assert _nparts(ensure_parallelism(docs)) == _nparts(docs)
        # explicit min_partitions bypasses the estimate entirely
        os.environ["BIKIDATA_SPARK_FANOUT_BYTES"] = str(1 << 40)
        assert _nparts(ensure_parallelism(docs, min_partitions=5)) == 5
    finally:
        os.environ.pop("BIKIDATA_SPARK_FANOUT_BYTES", None)
    # default target: between no-op and the cores cap, never wider
    assert 1 <= _nparts(ensure_parallelism(docs)) <= max(cores, _nparts(docs))


def test_fanout_width_does_not_change_results(spark, docs):
    # partition-count invariance of a fan-out consumer: identical pairs
    # at the pre-r14 width and at the size-derived width
    try:
        os.environ["BIKIDATA_SPARK_FANOUT_BYTES"] = "1"
        wide = {tuple(r) for r in dd.minhash_lsh_pairs(docs, "doc_id", "text").collect()}
    finally:
        os.environ.pop("BIKIDATA_SPARK_FANOUT_BYTES", None)
    adaptive = {tuple(r) for r in dd.minhash_lsh_pairs(docs, "doc_id", "text").collect()}
    assert wide == adaptive and len(wide) > 0
