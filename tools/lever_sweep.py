"""Dedup/ANN scale-lever re-sweep (r11 verdict item 2, second half).

The levers — MinHash (num_hashes × rows_per_band banding), n-gram
Jaccard's ``max_df`` stop-shingle cap, IVF's ~sqrt(N) cell count and
``nprobe`` — were last swept at r5 on sf0.1. Re-sweep them at sf1
(50k documents / 20k embeddings) and print one JSON doc: per config,
median wall seconds (of ``reps``) + output row count, and for ANN the
recall@10 against the brute-force ground truth, so the defaults can be
re-justified (or moved) with current code.

    SPARK_GRAFT_SF_DIR=testdata_sf1 python tools/lever_sweep.py
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from bikidata_spark.operators import dedup as dd
from bikidata_spark.operators import similarity as sim
from bikidata_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "testdata_sf1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    spark = get_spark("lever-sweep")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    n_docs = docs.count()
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n_vecs = embs.count()
    out: dict = {"sf_dir": sf_dir, "docs": n_docs, "vectors": n_vecs, "sweeps": {}}

    def run(fn):
        runs, count = [], None
        for _ in range(reps):
            t0 = time.perf_counter()
            count = fn()
            runs.append(time.perf_counter() - t0)
        return round(statistics.median(runs), 2), count

    # ---- MinHash banding: b×r tradeoff (same verified-pairs target) --
    mh = {}
    for num_hashes, rpb in [(16, 1), (16, 2), (16, 4), (8, 2), (32, 2), (32, 4)]:
        t, c = run(
            lambda: dd.minhash_lsh_pairs(
                docs, "doc_id", "text", num_hashes=num_hashes, rows_per_band=rpb
            ).count()
        )
        mh[f"n{num_hashes}_r{rpb}"] = {"s": t, "pairs": c}
    out["sweeps"]["minhash"] = mh

    # ---- n-gram Jaccard max_df stop-shingle cap ----------------------
    nj = {}
    for max_df in [50, 200, 1000, None]:
        t, c = run(
            lambda: dd.ngram_jaccard_pairs(
                docs, "doc_id", "text", max_df=max_df
            ).count()
        )
        nj[f"max_df={max_df}"] = {"s": t, "pairs": c}
    out["sweeps"]["ngram_jaccard"] = nj

    # ---- IVF: cell count (centroid_step) × nprobe, recall@10 ---------
    queries = embs.filter(F.col("vec_id") < 20)
    truth = {
        (r["qid"], r["neighbor"])
        for r in sim.cosine_topk(embs, queries, k=10).collect()
    }
    step0 = sim._seed_step(embs)
    ivf = {}
    for step, nprobe in [
        (step0, 1), (step0, 2), (step0, 4),
        (max(step0 // 4, 1), 2), (step0 * 4, 2),
    ]:
        def go():
            got = sim.ivf_ann_topk(
                embs, queries, centroid_step=step, nprobe=nprobe, k=10
            ).collect()
            return got

        runs = []
        got = None
        for _ in range(reps):
            t0 = time.perf_counter()
            got = go()
            runs.append(time.perf_counter() - t0)
        hits = sum((r["qid"], r["neighbor"]) in truth for r in got)
        ivf[f"step{step}_probe{nprobe}"] = {
            "s": round(statistics.median(runs), 2),
            "cells_approx": max(n_vecs // step, 1),
            "recall_at_10": round(hits / max(len(truth), 1), 3),
        }
    out["sweeps"]["ivf"] = ivf

    print(json.dumps(out))


if __name__ == "__main__":
    main()
