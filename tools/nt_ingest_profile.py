"""Decompose q_nt_ingest / q_nt_ingest_bz2 cost (r15, VERDICT item 8):
is the bz2 section codec-bound (decompression) or parse-bound (regex)
or build-bound (dictionary shuffle)?

Writes the same gz (multi-part) and bz2 (single splittable file) dumps
bench.py uses at $SPARK_GRAFT_SF_DIR, then times, per codec, on a
fresh-ish plan each rep:

  decode  — read the text lines and count them (decompression + line
            split only; the regex never runs)
  parse   — read_nt(...).count() (decompression + regex field split)
  build   — full from_string_quads ingest (parse + hash + two
            dictionary shuffles), the bench's timed body

parse-minus-decode isolates the regex; build-minus-parse isolates the
dictionary build. One JSON line with medians of $SPARK_GRAFT_BENCH_REPS
(default 3) reps.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from bikidata_spark import from_string_quads
from bikidata_spark.session import get_spark
from bikidata_spark.sources.ntriples import read_nt
from bikidata_spark.sources.rdfize import string_quads


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    spark = get_spark("nt-profile")
    quads = string_quads(spark, sf_dir)
    lines = quads.select(
        F.concat(F.concat_ws(" ", "s", "p", "o"), F.lit(" .")).alias("value")
    )
    ntdir = tempfile.mkdtemp(prefix="ntprof_")
    out: dict = {"sf_dir": sf_dir, "reps": reps}
    try:
        lines.write.option("compression", "gzip").mode("overwrite").text(
            f"{ntdir}/dump.nt"
        )
        lines.coalesce(1).write.option("compression", "bzip2").mode(
            "overwrite"
        ).text(f"{ntdir}/dump_bz2.nt")

        def timed(fn):
            fn()  # warmup
            runs = []
            for _ in range(reps):
                t0 = time.perf_counter()
                fn()
                runs.append(time.perf_counter() - t0)
            runs.sort()
            return round(statistics.median(runs), 3), [round(x, 3) for x in runs]

        for tag, src in (("gz", f"{ntdir}/dump.nt"), ("bz2", f"{ntdir}/dump_bz2.nt")):
            dec, dec_r = timed(lambda: spark.read.text(src).count())
            par, par_r = timed(lambda: read_nt(spark, src).count())

            def build():
                parsed = read_nt(spark, src).persist()
                g = from_string_quads(parsed)
                g.triples.count()
                g.terms.count()
                parsed.unpersist()

            bld, bld_r = timed(build)
            out[tag] = {
                "decode_s": dec,
                "parse_s": par,
                "build_s": bld,
                "regex_premium_s": round(par - dec, 3),
                "dict_premium_s": round(bld - par, 3),
                "decode_reps": dec_r,
                "parse_reps": par_r,
                "build_reps": bld_r,
            }
    finally:
        shutil.rmtree(ntdir, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
