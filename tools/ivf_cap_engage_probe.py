"""r14 verdict item 5 — engage the REAL 4096-cell IVF cap once.

The r13 growth demo proved the capped schedule's ~linear write growth
with ``_MAX_CELLS`` scaled down to 64; the shipped 4096 had never
engaged on data (it needs > 16,777,216 vectors). This probe generates
a 17.1M-row 8-d float32 vector table (just past the 4096² boundary,
~650 MB), runs ``write_ivf_store`` once with the production constant,
and asserts the three things the 100 TB story rests on:

  1. the schedule self-capped: ceil(n/step) == 4096 cells scheduled,
     and the written store's distinct cell count is ≤ 4096 (empty
     cells drop out of the layout, never exceed it);
  2. pruning is intact at that scale: one ``ivf_store_topk`` query
     reads only its nprobe probed cell directories (asserted from the
     scan's input files), not the corpus;
  3. results are valid: every returned neighbor's cosine is
     recomputed driver-side from the raw vectors and must match the
     store-served score.

    python tools/ivf_cap_engage_probe.py [out.json]

Writes the vector table + store under /tmp (cleaned up after) and
prints one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from pyspark.sql import functions as F

from bikidata_spark.operators import similarity as sim
from bikidata_spark.session import get_spark

N = 17_100_000  # just past the 4096² = 16,777,216 boundary
DIM = 8


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    work = "/tmp/ivf_cap_engage"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    spark = get_spark("ivf-cap-engage")
    out: dict = {"probe": "real _MAX_CELLS=4096 engagement", "n": N, "dim": DIM,
                 "max_cells": sim._MAX_CELLS}

    # deterministic synthetic vectors: 8 hash-derived doubles in [-1,1)
    # per id — seedless, reproducible, no driver materialization
    t0 = time.perf_counter()
    cols = [
        (
            (F.xxhash64(F.col("id"), F.lit(d)) % 1_000_000) / 500_000.0 - 1.0
        ).alias(f"x{d}")
        for d in range(DIM)
    ]
    vecs = (
        spark.range(N)
        .select(F.col("id").alias("vec_id"), F.array(*cols).alias("embedding"))
    )
    vecs.write.mode("overwrite").parquet(f"{work}/vectors")
    out["gen_s"] = round(time.perf_counter() - t0, 1)
    vecs = spark.read.parquet(f"{work}/vectors")

    step = sim._cell_step(N)
    cells_scheduled = -(-N // step)
    out["step"] = step
    out["cells_scheduled"] = cells_scheduled
    assert cells_scheduled == sim._MAX_CELLS, (cells_scheduled, sim._MAX_CELLS)

    t0 = time.perf_counter()
    sim.write_ivf_store(vecs, f"{work}/ivf", "vec_id", "embedding")
    out["write_ivf_s"] = round(time.perf_counter() - t0, 1)

    stored = spark.read.parquet(f"{work}/ivf/vectors")
    n_cells = stored.select("cell").distinct().count()
    out["cells_written"] = n_cells
    assert n_cells <= sim._MAX_CELLS, n_cells
    out["store_rows"] = stored.count()
    assert out["store_rows"] == N

    # one query through the pruned path
    qid = 12345
    qrow = vecs.filter(F.col("vec_id") == qid).first()
    q = spark.createDataFrame([(qid, [float(x) for x in qrow["embedding"]])],
                              "vec_id long, embedding array<double>")
    nprobe = 2
    t0 = time.perf_counter()
    topk_df = sim.ivf_store_topk(spark, f"{work}/ivf", q, k=10, nprobe=nprobe)
    rows = topk_df.collect()
    out["topk_s"] = round(time.perf_counter() - t0, 2)
    out["topk_rows"] = len(rows)
    assert len(rows) == 10

    # pruning: the probed scan must touch only the nprobe cells' files
    pruned = sim._ivf_pruned_vectors(spark, f"{work}/ivf", q, nprobe=nprobe)
    files = [r["f"] for r in pruned.select(F.input_file_name().alias("f")).distinct().collect()]
    cells_read = {p.split("cell=")[1].split("/")[0] for p in files if "cell=" in p}
    out["cells_read"] = sorted(cells_read)
    assert 0 < len(cells_read) <= nprobe, cells_read

    # validity: recompute each returned neighbor's cosine driver-side
    qv = np.array(qrow["embedding"], dtype=np.float64)
    ids = [r["neighbor"] for r in rows]
    raw = {r["vec_id"]: np.array(r["embedding"]) for r in
           vecs.filter(F.col("vec_id").isin(ids)).collect()}
    max_err = 0.0
    for r in rows:
        nv = raw[r["neighbor"]]
        want = float(qv @ nv / math.sqrt((qv @ qv) * (nv @ nv)))
        max_err = max(max_err, abs(want - r["sim"]))
    out["score_max_abs_err"] = max_err
    assert max_err < 1e-9, max_err

    shutil.rmtree(work, ignore_errors=True)
    line = json.dumps(out)
    print(line)
    if out_path:
        Path(out_path).write_text(line + "\n")


if __name__ == "__main__":
    main()
