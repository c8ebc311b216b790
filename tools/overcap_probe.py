"""Which driver-resident structures engage at $SPARK_GRAFT_SF_DIR under
DEFAULT budgets? (r11 verdict item 1: "publish which driver structures
go over-cap [at sf10] and what the pure-distributed geomean is when
they do".)

Builds the graph, asks each gate for its verdict (sizing probes only —
the same code paths serving uses), runs one query per family so the
second-sighting deferrals resolve, and prints one JSON line:
tier / term_cache / hop_index / order_index engaged-or-over-cap, with
the measured sizes the verdicts priced.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from bikidata_spark import Engine, from_string_quads
from bikidata_spark.session import get_spark
from bikidata_spark.sources.rdfize import string_quads


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "testdata_sf10")
    spark = get_spark("overcap-probe")
    graph = from_string_quads(string_quads(spark, sf_dir)).cache()
    n_quads = graph.triples.count()
    graph.terms.count()
    eng = Engine(graph)

    out: dict = {"sf_dir": sf_dir, "quads": n_quads, "defaults": {
        "local_tier_bytes": eng.local_tier_bytes,
        "local_tier_rows": eng.local_tier_rows,
        "term_cache_bytes": eng.term_cache_bytes,
        "residency_budget": eng._residency_budget(),
    }}

    tier = eng._local_tier()
    out["tier_engaged"] = tier is not None

    td = eng._term_dict()
    row = graph.terms.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.octet_length("value")).alias("b")
    ).first()
    out["term_cache_engaged"] = td is not None
    out["terms"] = {"n": int(row["n"]), "blob_bytes": int(row["b"] or 0)}

    # hop: run the walk twice (second sighting builds or prices the index)
    hop_opts = {
        "filters": [{"p": "<p/nation> 1", "o": "<e/nation/5>"}],
        "use_cache": False,
    }
    eng.subjects_values(dict(hop_opts)).count()
    eng.subjects_values(dict(hop_opts)).count()
    hs = eng._hop_idx_state
    out["hop_index_engaged"] = bool(hs is not None and hs[1] is not None)

    # order: page the label rule twice
    order_opts = {
        "filters": [{"p": "<p/mktsegment>", "o": '"BUILDING"'}],
        "order": {"by": "label"},
        "size": 10,
        "use_cache": False,
    }
    t0 = time.perf_counter()
    eng.query(dict(order_opts))
    first_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    eng.query(dict(order_opts))
    second_s = time.perf_counter() - t0
    ents = list(eng._order_idx_cache.values())
    out["order_index_engaged"] = any(e != "over_cap" for e in ents)
    out["order_index_over_cap"] = "over_cap" in ents
    out["order_page_s"] = [round(first_s, 2), round(second_s, 2)]

    out["driver_residency"] = {
        k: v for k, v in eng.driver_residency().items() if k != "structures"
    }
    out["residency_structures"] = eng.driver_residency()["structures"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
