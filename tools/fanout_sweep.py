"""Sweep BIKIDATA_SPARK_FANOUT_BYTES over the fan-out-heavy bench
sections at sf0.1 on local[32]. Setting "1" reproduces the pre-r14
unconditional cores-wide fan-out (the control)."""
import json, os, statistics, sys, time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F

from bikidata_spark.session import get_spark
from bikidata_spark.operators import dedup as dd
from bikidata_spark.operators import events as ev
from bikidata_spark.operators import similarity as sim
from bikidata_spark.functions.text import lang_id, quality_score

sf_dir = "/root/testdata/sf0.1"
spark = get_spark("fanout-sweep")
sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod

SETTINGS = ["1", "131072", "262144", "524288", "1048576", "4194304"]
REPS = 3
out = []

def docs():
    return spark.read.parquet(f"{sf_dir}/documents.parquet")

def embs():
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")

SECTIONS = {
    "q_dedup_minhash": lambda: dd.minhash_lsh_pairs(docs(), "doc_id", "text").count(),
    "q_dedup_exact": lambda: dd.exact_dedup(docs(), "doc_id", "text").count(),
    "q_text_analysis": lambda: lang_id(docs(), "doc_id", "text")
        .join(quality_score(docs(), "doc_id", "text"), "doc_id").count(),
    "q_events_sessionize": lambda: ev.sessionize(entrymod.load_events(spark, sf_dir)).count(),
    "q_ann_topk": lambda: sim.cosine_topk(embs(), embs().filter(F.col("vec_id") < 5)).count(),
    "q_ann_ivf": lambda: sim.ivf_ann_topk(embs(), embs().filter(F.col("vec_id") < 5)).count(),
}

# global warmup
for fn in SECTIONS.values():
    fn()

for setting in SETTINGS:
    os.environ["BIKIDATA_SPARK_FANOUT_BYTES"] = setting
    row = {"fanout_bytes": setting}
    for name, fn in SECTIONS.items():
        samples = []
        for i in range(REPS + 1):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            if i:
                samples.append(round(dt, 3))
        samples.sort()
        row[name] = {"median": statistics.median(samples), "reps": samples}
    out.append(row)
    print(json.dumps(row), flush=True)

os.environ.pop("BIKIDATA_SPARK_FANOUT_BYTES", None)
with open("/tmp/fanout_sweep_out.json", "w") as f:
    json.dump(out, f, indent=1)
