"""Local mirror of the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB over
the same parquet tables; compare row count, column names, and
order-insensitive values.

Usage: python tools/selfcheck.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

import __spark_entry__ as entrymod
from bikidata_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(str(r[i]) for i in order))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("selfcheck")
    con = duck_connection(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if name_filter and name_filter not in name:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failed.append(name)
            continue
        osql = oracles.get(name)
        if osql is None:
            print(f"PASS(rows-only) {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            continue
        try:
            cur = con.execute(osql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {type(e).__name__}: {e}")
            failed.append(name)
            continue
        sn = normalize(srows, scols)
        on = normalize(orows, ocols)
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns {scols} vs {ocols}")
            failed.append(name)
        elif sn != on:
            on_set, sn_set = set(on), set(sn)
            diff_a = [r for r in sn if r not in on_set][:3]
            diff_b = [r for r in on if r not in sn_set][:3]
            print(
                f"FAIL {name}: {len(sn)} vs {len(on)} rows; spark-only {diff_a}; oracle-only {diff_b}"
            )
            failed.append(name)
        else:
            print(f"PASS {name}: {len(sn)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
