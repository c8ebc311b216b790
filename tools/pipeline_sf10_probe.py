"""r13 (r12 verdict item 5): run pipeline-shaped operators at sf10.

Dedup/ANN levers were swept at sf1; nothing pipeline-shaped had
touched the 10x documents table. Runs minhash-LSH near-dup pair
generation and connected components (large/small-star variant, the
heavy-skew-safe one) over testdata_sf10/documents.parquet, records
wall times + result sizes + a mechanical plan audit (no cartesian /
per-row python eval on either plan), prints one JSON line.

    python tools/pipeline_sf10_probe.py [sf_dir]
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bikidata_spark.operators import dedup as dd
from bikidata_spark.session import get_spark


def _audit(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "cartesian": "CartesianProduct" in plan,
        "bnl_join": "BroadcastNestedLoopJoin" in plan,
        "python_eval": "BatchEvalPython" in plan,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "testdata_sf10"
    spark = get_spark("pipe-sf10")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    out: dict = {"sf_dir": sf_dir, "docs": n_docs}

    pairs = dd.minhash_lsh_pairs(docs, "doc_id", "text")
    t0 = time.perf_counter()
    n_pairs = pairs.count()
    out["minhash_pairs_s"] = round(time.perf_counter() - t0, 3)
    out["minhash_pairs"] = n_pairs
    out["minhash_plan"] = _audit(pairs)

    pairs_p = pairs.persist()
    pairs_p.count()
    # time construction + action together: the star rounds run eager
    # actions inside the builder (convergence checks), so timing only
    # the final count would miss the actual work
    t0 = time.perf_counter()
    comp = dd.connected_components_star(pairs_p)
    n_rows = comp.count()
    out["components_star_s"] = round(time.perf_counter() - t0, 3)
    n_comp = comp.select("component").distinct().count()
    out["component_members"] = n_rows
    out["components"] = n_comp
    out["star_plan"] = _audit(comp)
    pairs_p.unpersist()

    # r14 (r13 verdict item 8): the remaining heavy hitters at sf10
    t0 = time.perf_counter()
    ded = dd.exact_dedup(docs, "doc_id", "text")
    out["exact_dedup_groups"] = ded.count()
    out["exact_dedup_s"] = round(time.perf_counter() - t0, 3)
    out["exact_plan"] = _audit(ded)

    t0 = time.perf_counter()
    ng = dd.ngram_jaccard_pairs(docs, "doc_id", "text", max_df=50)
    out["ngram_maxdf50_pairs"] = ng.count()
    out["ngram_maxdf50_s"] = round(time.perf_counter() - t0, 3)
    out["ngram_plan"] = _audit(ng)

    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from bikidata_spark.operators import similarity as sim

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out["vectors"] = embs.count()
    ivf_dir = tempfile.mkdtemp(prefix="pipe_sf10_ivf_")
    t0 = time.perf_counter()
    sim.write_ivf_store(embs, f"{ivf_dir}/ivf", "vec_id", "embedding")
    out["ivf_store_write_s"] = round(time.perf_counter() - t0, 3)
    stored = spark.read.parquet(f"{ivf_dir}/ivf/vectors")
    out["ivf_cells"] = stored.select("cell").distinct().count()
    q = embs.filter(F.col("vec_id") < 3)
    t0 = time.perf_counter()
    out["ivf_store_topk_rows"] = sim.ivf_store_topk(
        *sim.read_ivf_store(spark, f"{ivf_dir}/ivf"), q, k=10, nprobe=2
    ).count()
    out["ivf_store_topk_s"] = round(time.perf_counter() - t0, 3)
    shutil.rmtree(ivf_dir, ignore_errors=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
