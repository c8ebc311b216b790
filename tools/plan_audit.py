"""Physical-plan audit: regenerates docs/PLANS.md with the executed-plan
evidence for the engine's headline claims (pushdown, pruning, broadcast
joins, no Python in hot paths, partition-pruned FTS store).

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from bikidata_spark.graph import from_string_quads, read_graph, write_graph
from bikidata_spark.operators import dedup as dd
from bikidata_spark.operators.fts import read_fts_index, write_fts_index
from bikidata_spark.functions.text import repetition_score
from bikidata_spark.operators.events import funnel, range_join
from bikidata_spark.operators.similarity import embedding_neardup_pairs
from bikidata_spark.operators.pipeline import clean_corpus, decontaminate
from bikidata_spark.plans.query import Engine
from bikidata_spark.session import get_spark
from bikidata_spark.sources.rdfize import string_quads


def _load_events(spark, sf_dir):
    # events.parquet carries TIMESTAMP(NANOS); read nanos as long and
    # truncate to micros (same handling as __spark_entry__.load_events)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") in ("bigint", "long"):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def _range_join_sample(spark):
    pts = spark.range(1000).select(F.col("id").alias("pid"), (F.col("id") * 7).alias("pt"))
    ivs = spark.range(200).select(
        F.col("id").alias("iid"),
        (F.col("id") * 31).alias("lo"),
        (F.col("id") * 31 + 50).alias("hi"),
    )
    return range_join(pts, ivs, bucket_width=64)

KEEP = re.compile(
    r"FileScan|PushedFilters|PartitionFilters|ReadSchema|BroadcastHashJoin|"
    r"SortMergeJoin|ShuffledHashJoin|Exchange|HashAggregate|BatchEvalPython|"
    r"ArrowEvalPython|InMemoryTableScan|TakeOrderedAndProject"
)


def digest(df, max_lines: int = 14) -> str:
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = [ln.strip()[:160] for ln in plan.splitlines() if KEEP.search(ln)]
    # the PartitionFilters clause sits far right on FileScan lines and
    # the 160-char cut can lose it — surface non-empty ones explicitly
    pfs = [p[:160] for p in re.findall(r"PartitionFilters: \[[^\]]+\]", plan)]
    lines += [f"  ^ {p}" for p in dict.fromkeys(pfs)]
    n_exchange = plan.count("Exchange")
    n_python = plan.count("BatchEvalPython") + plan.count("ArrowEvalPython")
    joins = re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", plan)
    head = f"exchanges={n_exchange} python_stages={n_python} joins={joins or 'none'}"
    body = "\n".join(lines[:max_lines + 2]) or "(no matching operators — pure in-memory scan)"
    return f"{head}\n```\n{body}\n```"


def _semantic_ivf_sample(spark, g, sf_dir: str, tmp: str):
    """Engine._semantic_filter served from a persisted IVF store: the
    returned frame's scan must partition-prune to the probed cells."""
    from bikidata_spark.operators.similarity import write_ivf_store

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.xxhash64(
            F.concat(F.lit("<e/documents/"), F.col("vec_id").cast("string"), F.lit(">"))
        ).alias("s"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    from bikidata_spark.operators.similarity import _seed_step

    emb_raw = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = (
        emb_raw.filter(F.col("vec_id") % _seed_step(emb_raw) == 0)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").cast("array<double>").alias("cv"))
    )
    write_ivf_store(emb, f"{tmp}/sem_ivf", "s", "vec", centroids=cents)
    eng = Engine(g, embeddings=emb)
    eng.load_ivf(f"{tmp}/sem_ivf", nprobe=2)
    qvec = [float(x) for x in emb.first()["vec"]]
    subj, _ = eng._semantic_filter({"vector": qvec}, "", None)
    return subj


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit")
    g = from_string_quads(string_quads(spark, sf_dir)).cache()
    g.triples.count()
    eng = Engine(g)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    import tempfile

    tmp = tempfile.mkdtemp(prefix="plan_audit_")
    write_graph(g, f"{tmp}/graph")
    disk = Engine(read_graph(spark, f"{tmp}/graph"))
    write_fts_index(eng.fts, f"{tmp}/fts", num_buckets=16)
    pidx = read_fts_index(spark, f"{tmp}/fts")

    sections = [
        (
            "Boolean filter (cached graph)",
            "should/must/not compile to union/intersect/anti-joins on subject "
            "longs; the term hashes constant-fold so the quad scan is filtered.",
            eng.subjects_values(
                {
                    "filters": [
                        {"p": "<p/mktsegment>", "o": '"BUILDING"'},
                        {"op": "must", "p": "<p/nation>", "o": "<e/nation/5>"},
                    ],
                    "use_cache": False,
                }
            ),
        ),
        (
            "Property lookup (persisted graph store)",
            "the constant-folded xxhash64 reaches the parquet scan as a "
            "PushedFilter; only (s, p) are read from the 4-column store.",
            disk.graph.triples.filter(
                F.col("p") == F.xxhash64(F.lit("<p/mktsegment>"))
            ).select("s"),
        ),
        (
            "FTS match (persisted token-bucketed store)",
            "the query's terms map to crc32 buckets driver-side; the scan's "
            "PartitionFilters prove only those bucket directories are read.",
            pidx.match("customer 000000013"),
        ),
        (
            "n-hop walk",
            "the filtered subject set broadcasts; the quad table never "
            "shuffles for the walk.",
            eng.subjects_values(
                {"filters": [{"p": "<p/nation> 1", "o": "<e/nation/5>"}], "use_cache": False}
            ),
        ),
        (
            "MinHash LSH near-dup",
            "shingle→sign→band candidates and array_intersect verification — "
            "every stage JVM-side (zero Python stages).",
            dd.minhash_lsh_pairs(docs, "doc_id", "text"),
        ),
        (
            "Corpus cleaning composition",
            "quality gate and dedup-survivor semi-joins fuse into one scan "
            "pipeline; no materialized intermediates between 'stages'.",
            clean_corpus(docs, "doc_id", "text"),
        ),
        (
            "Range join (bucket-decomposed)",
            "the inequality pair-up plans as a hash equi-join on the bucket "
            "key + exact filter — NOT a nested-loop cross product.",
            _range_join_sample(spark),
        ),
        (
            "Train/eval decontamination",
            "the eval shingle set broadcasts; contamination is a map-side "
            "semi-join on the corpus scan — no corpus shuffle for the match.",
            decontaminate(
                docs.filter(F.col("doc_id") % 37 != 0),
                docs.filter(F.col("doc_id") % 37 == 0),
                "doc_id",
                "text",
                3,
            ),
        ),
        (
            "Repetition scoring (Gopher rules)",
            "line stats are pure array expressions; gram stats are map-side-"
            "combinable aggregates keyed by doc id — zero Python stages.",
            repetition_score(docs, "doc_id", "text"),
        ),
        (
            "Funnel (ordered progression)",
            "per-stage reductions all key on user_id — one real shuffle, "
            "later groupBys reuse the hash partitioning (subset clustering).",
            funnel(_load_events(spark, sf_dir)),
        ),
        (
            "IVF ANN with k-means refine (shuffle-free assignment)",
            "the centroid set folds to ONE broadcast array row; corpus cell "
            "assignment and query probes are map-side folds over it — no "
            "Exchange between the vector scan and its cell id, and no "
            "window over an N·k expansion (the only Window left is the "
            "final per-query top-k, planned as WindowGroupLimit).",
            __import__("bikidata_spark.operators.similarity", fromlist=["ivf_ann_topk"]).ivf_ann_topk(
                spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
                spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(F.col("vec_id") < 5),
                refine_iters=2,
                quantize=6,
            ),
        ),
        (
            "Persisted IVF store (cell-pruned ANN serving)",
            "vectors are stored partitioned by cell; probe cells resolve "
            "driver-side from the tiny centroid table, so the scan's "
            "PartitionFilters prove only the probed cell directories are "
            "read — the FTS token-bucket story applied to vectors.",
            (lambda _sim, _tmp: (
                _sim.write_ivf_store(
                    spark.read.parquet(f"{sf_dir}/embeddings.parquet"), f"{_tmp}/ivf"
                ),
                _sim.ivf_store_topk(
                    *_sim.read_ivf_store(spark, f"{_tmp}/ivf"),
                    spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
                        F.col("vec_id") < 5
                    ),
                ),
            )[1])(
                __import__("bikidata_spark.operators.similarity", fromlist=["x"]), tmp
            ),
        ),
        (
            "Semantic RDF filter (IVF-store-backed)",
            "the `semantic` filter's probe cells resolve driver-side from "
            "the tiny centroid table, so the embeddings scan carries a "
            "static `cell IN (...)` PartitionFilter and reads only the "
            "probed cell directories — the full-corpus-scan-per-query "
            "plan is gone; the exact distance<0.5 filter runs within the "
            "probed cells.",
            _semantic_ivf_sample(spark, g, sf_dir, tmp),
        ),
        (
            "Embedding near-dup (bucketed scale path)",
            "hyperplane sign buckets turn the all-pairs product into an "
            "equi-join on bucket; the cosine filter rides the join.",
            embedding_neardup_pairs(
                spark.read.parquet(f"{sf_dir}/embeddings.parquet"), planes=4
            ),
        ),
    ]

    out = [
        "# Physical-plan audit",
        "",
        f"Generated by `python tools/plan_audit.py {sf_dir}` — executed-plan",
        "evidence for the scale-design claims in SURVEY.md §4. Key lines only",
        "(FileScan / filters / joins / exchanges / Python stages).",
        "",
    ]
    for title, claim, df in sections:
        out += [f"## {title}", "", f"*{claim}*", "", digest(df), ""]
    Path("docs").mkdir(exist_ok=True)
    # everything below the HAND marker is narrative written by hand
    # across rounds — carry it over verbatim so a regeneration never
    # drops it again
    marker = "<!-- HAND-WRITTEN SECTIONS BELOW — preserved by plan_audit.py -->"
    prev = Path("docs/PLANS.md")
    tail = ""
    if prev.exists() and marker in (old := prev.read_text()):
        tail = old.split(marker, 1)[1].lstrip("\n")
    Path("docs/PLANS.md").write_text("\n".join(out) + f"\n{marker}\n\n" + tail)
    print(f"wrote docs/PLANS.md ({len(sections)} sections)")


if __name__ == "__main__":
    main()
