"""FTS + semantic DISTRIBUTED-path scale slopes (r11 verdict item 4).

These two surfaces have no reference ratio (the DuckDB fts extension
and the embedding endpoint are unreachable offline), so their scale
story needs our own cross-SF table: run the same fts/semantic sections
bench.py times — index build, BM25 search, IVF store write, IVF-pruned
semantic filter — at one SF per process and print one JSON line.
Invoke with the tier disabled so the DISTRIBUTED path (the 100 TB
story) is what's measured:

    for sf in /root/testdata/sf0.1 testdata_sf1 testdata_sf3; do
      BIKIDATA_SPARK_LOCAL_TIER_ROWS=0 SPARK_GRAFT_SF_DIR=$sf \
        python tools/fts_semantic_slopes.py >> /tmp/slopes.jsonl
    done

The slope per decade (t_sfN+1 / t_sfN over 10x data) goes in
docs/BENCH_NOTES.md next to the RDF slopes.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from bikidata_spark import Engine, from_string_quads
from bikidata_spark.operators import similarity as sim
from bikidata_spark.operators.fts import build_fts_index
from bikidata_spark.session import get_spark
from bikidata_spark.sources.rdfize import string_quads


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    spark = get_spark("fts-semantic-slopes")

    times: dict[str, float] = {}
    rep_times: dict[str, list[float]] = {}

    def timed(name, fn):
        fn()  # untimed warmup, bench.py protocol
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        rep_times[name] = [round(x, 3) for x in runs]
        times[name] = round(statistics.median(runs), 3)

    graph = from_string_quads(string_quads(spark, sf_dir)).cache()
    n_quads = graph.triples.count()
    graph.terms.count()
    eng = Engine(graph)

    def _drop_fts(idx):
        for df in (idx.postings, idx.token_df, idx.doc_len):
            try:
                df.unpersist()
            except Exception:
                pass

    def fts_build():
        if eng._fts is not None:
            _drop_fts(eng._fts)
            eng._fts = None
        eng.fts

    timed("q_fts_index", fts_build)
    timed(
        "q_fts_search",
        lambda: eng.page(
            {
                "filters": [{"p": "fts", "o": "customer 000000013"}],
                "size": 50,
                "use_cache": False,
            }
        ).collect(),
    )

    def stemmed_build():
        _drop_fts(build_fts_index(graph.literals(), stem=True))

    timed("q_fts_index_stemmed", stemmed_build)

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_vecs = embs.count()
    sstore = tempfile.mkdtemp(prefix="slopes_sem_ivf_")
    sem_emb = embs.select(
        F.xxhash64(
            F.concat(
                F.lit("<e/documents/"), F.col("vec_id").cast("string"), F.lit(">")
            )
        ).alias("s"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    sem_cents = embs.filter(F.col("vec_id") % sim._seed_step(embs) == 0).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )
    timed(
        "q_semantic_store_write",
        lambda: sim.write_ivf_store(
            sem_emb, f"{sstore}/ivf", "s", "vec", centroids=sem_cents
        ),
    )
    qvec = [float(x) for x in embs.filter(F.col("vec_id") == 0).first()["embedding"]]
    seng = Engine(graph, embeddings=sem_emb)
    seng.load_ivf(f"{sstore}/ivf", nprobe=2)
    timed(
        "q_semantic_filter_ivf",
        lambda: seng._semantic_filter({"vector": qvec}, "", None)[0].count(),
    )

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "quads": n_quads,
                "vectors": n_vecs,
                "tier_rows_env": os.environ.get("BIKIDATA_SPARK_LOCAL_TIER_ROWS"),
                "times": times,
                "reps": rep_times,
            }
        )
    )


if __name__ == "__main__":
    main()
