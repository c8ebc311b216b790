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
    svec, scents = sim.read_ivf_store(spark, f"{work}/ivf")
    t0 = time.perf_counter()
    rows = sim.ivf_store_topk(svec, scents, q, k=10, nprobe=nprobe).collect()
    out["topk_s"] = round(time.perf_counter() - t0, 2)
    out["topk_rows"] = len(rows)
    assert len(rows) == 10

    # pruning: rebuild the probed scan exactly as ivf_store_topk does
    # and assert it touches only the nprobe cells' partition files
    qv = np.array(qrow["embedding"], dtype=np.float64)
    carr = sim._cent_arr(scents)
    probes = q.select(F.col("vec_id").alias("qid"),
                      F.col("embedding").alias("qv")).crossJoin(
        F.broadcast(carr)
    ).select(F.explode(sim._nearest_cells(F.col("qv"), F.col("cents"), nprobe)).alias("cell"))
    cells = sorted({r["cell"] for r in probes.distinct().collect()})
    out["cells_probed"] = cells
    assert 0 < len(cells) <= nprobe, cells
    pruned = svec.filter(F.col("cell").isin(cells))
    files = [r["f"] for r in pruned.select(F.input_file_name().alias("f")).distinct().collect()]
    cells_read = {p.split("cell=")[1].split("/")[0] for p in files if "cell=" in p}
    out["cells_read"] = sorted(int(c) for c in cells_read)
    assert set(out["cells_read"]) <= set(cells), (out["cells_read"], cells)
    out["pruned_rows"] = pruned.count()
    assert out["pruned_rows"] < N // 100  # read ~nprobe/4096 of the corpus

    # validity: recompute each returned neighbor's cosine driver-side
    # and assert the served ranking IS the cosine-desc/neighbor-asc
    # order of the returned set
    ids = [r["neighbor"] for r in rows]
    raw = {r["vec_id"]: np.array(r["embedding"]) for r in
           vecs.filter(F.col("vec_id").isin(ids)).collect()}
    sims = {
        n: float(qv @ raw[n] / math.sqrt((qv @ qv) * (raw[n] @ raw[n])))
        for n in ids
    }
    served = [r["neighbor"] for r in sorted(rows, key=lambda r: r["rank"])]
    want = sorted(ids, key=lambda n: (-sims[n], n))
    out["rank_order_ok"] = served == want
    assert served == want, (served, want)

    shutil.rmtree(work, ignore_errors=True)
    line = json.dumps(out)
    print(line)
    if out_path:
        Path(out_path).write_text(line + "\n")


if __name__ == "__main__":
    main()
