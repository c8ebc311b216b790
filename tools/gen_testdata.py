"""Generate larger scale factors of the driver's synthetic testdata.

The driver ships sf0.001/0.01/0.1 (TESTDATA.md, read-only). The r4
verdict's top item is a SCALE PROOF — run the full oracle suite and
bench at sf1 (10× sf0.1) — so this generator reproduces the same star
schema, value domains, and planted structure (near-duplicate documents
with a ``dup`` suffix marker, exact copies, label-clustered
embeddings) at any sf, seeded and deterministic. Output is written
under the repo (``testdata_sfN/``, gitignored — ~170 MB at sf1);
/root/testdata itself is never touched.

Usage: python tools/gen_testdata.py <sf> [out_dir]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "spark window merge table column vector stream value data small join "
    "filter big group hash customer sort order slow line part fast the row "
    "agg key query a scan batch"
).split()
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENTS = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "zh", "de", "es", "fr"]


def write(out: Path, name: str, cols: dict) -> None:
    pq.write_table(pa.table(cols), out / f"{name}.parquet")
    print(f"{name}: {len(next(iter(cols.values())))} rows")


def main() -> None:
    sf = float(sys.argv[1])
    out = Path(sys.argv[2] if len(sys.argv) > 2 else f"testdata_sf{sys.argv[1]}")
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(42)
    s = sf / 0.1  # sizes below are the sf0.1 row counts

    write(out, "region", {
        "r_regionkey": np.arange(5, dtype=np.int32),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    })
    write(out, "nation", {
        "n_nationkey": np.arange(25, dtype=np.int32),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": (np.arange(25) % 5).astype(np.int32),
    })

    nc = int(15000 * s)
    write(out, "customer", {
        "c_custkey": np.arange(nc),
        "c_name": [f"Customer#{i:09d}" for i in range(nc)],
        "c_nationkey": rng.integers(0, 25, nc, dtype=np.int32),
        "c_acctbal": np.round(rng.uniform(0, 10000, nc), 2),
        "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, nc)],
    })

    ns = int(1000 * s)
    write(out, "supplier", {
        "s_suppkey": np.arange(ns),
        "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
        "s_nationkey": rng.integers(0, 25, ns, dtype=np.int32),
        "s_acctbal": np.round(rng.uniform(0, 10000, ns), 2),
    })

    np_ = int(20000 * s)
    adjectives = ["large", "hot", "small", "cold", "red", "green", "shiny", "dim"]
    nouns = ["ring", "bolt", "washer", "spring", "gear", "cog", "pin", "plate"]
    write(out, "part", {
        "p_partkey": np.arange(np_),
        "p_name": [
            f"{adjectives[a]} {nouns[b]}"
            for a, b in zip(rng.integers(0, 8, np_), rng.integers(0, 8, np_))
        ],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, np_)],
        "p_type": [PTYPES[i] for i in rng.integers(0, 6, np_)],
        "p_size": rng.integers(1, 51, np_, dtype=np.int32),
        "p_retailprice": np.round(900.0 + rng.uniform(0, 100, np_), 1),
    })

    no = int(150000 * s)
    base = np.datetime64("1995-01-01")
    span_days = int((np.datetime64("2001-08-01") - base) / np.timedelta64(1, "D"))
    write(out, "orders", {
        "o_orderkey": np.arange(no),
        "o_custkey": rng.integers(0, nc, no),
        "o_orderstatus": [["O", "F", "P"][i] for i in rng.integers(0, 3, no)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, no), 2),
        "o_orderdate": (base + rng.integers(0, span_days + 1, no).astype("timedelta64[D]")).astype("datetime64[us]"),
        "o_orderpriority": [PRIORITIES[i] for i in rng.integers(0, 5, no)],
    })

    nl = int(600000 * s)
    write(out, "lineitem", {
        "l_orderkey": rng.integers(0, no, nl),
        "l_partkey": rng.integers(0, np_, nl),
        "l_suppkey": rng.integers(0, ns, nl),
        "l_linenumber": rng.integers(1, 8, nl, dtype=np.int32),
        "l_quantity": rng.integers(1, 51, nl).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(1000, 100000, nl), 2),
        "l_discount": np.round(rng.integers(0, 11, nl) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, nl) / 100.0, 2),
        "l_returnflag": [["A", "N", "R"][i] for i in rng.integers(0, 3, nl)],
        "l_linestatus": [["O", "F"][i] for i in rng.integers(0, 2, nl)],
        "l_shipdate": (base + rng.integers(0, span_days + 60, nl).astype("timedelta64[D]")).astype("datetime64[us]"),
    })

    ne = int(100000 * s)
    nusers = int(1500 * s)
    t0 = np.datetime64("2024-01-01T00:00:00.000000")
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = np.sort(rng.integers(0, span_us, ne))
    write(out, "events", {
        "event_id": np.arange(ne),
        "ts": t0 + ts.astype("timedelta64[us]"),
        "user_id": rng.integers(0, nusers, ne),
        "event_type": [EVENTS[i] for i in rng.integers(0, 5, ne)],
        "value": np.round(rng.uniform(0, 600, ne), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, ne)],
    })

    nd = int(5000 * s)
    texts: list[str] = []
    for i in range(nd):
        r = rng.random()
        if i > 10 and r < 0.05:
            # planted near-duplicate: an earlier doc plus the marker
            texts.append(texts[rng.integers(0, i)] + " dup")
        elif i > 10 and r < 0.053:
            texts.append(texts[rng.integers(0, i)])  # exact copy
        else:
            n = int(rng.integers(8, 100))
            texts.append(" ".join(VOCAB[j] for j in rng.integers(0, len(VOCAB), n)))
    write(out, "documents", {
        "doc_id": np.arange(nd),
        "text": texts,
        "lang": [LANGS[i] for i in rng.integers(0, 5, nd)],
        "source": [f"src{i}" for i in rng.integers(0, 20, nd)],
        "n_chars": np.array([len(t) for t in texts]),
    })

    nv = int(2000 * s)
    labels = rng.integers(0, 10, nv)
    centers = rng.normal(size=(10, 64))
    vecs = centers[labels] * 0.5 + rng.normal(size=(nv, 64))
    write(out, "embeddings", {
        "vec_id": np.arange(nv),
        "embedding": [v.astype("float32") for v in vecs],
        "label": labels.astype(np.int32),
    })


if __name__ == "__main__":
    main()
