from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("BIKIDATA_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from bikidata_spark.session import get_spark

    s = get_spark("bikidata-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def engine(spark):
    from pyspark.sql import functions as F

    from bikidata_spark import Engine, from_string_quads
    from bikidata_spark.sources.rdfize import string_quads

    graph = from_string_quads(string_quads(spark, SF_DIR)).cache()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        F.xxhash64(
            F.concat(F.lit("<e/documents/"), F.col("vec_id").cast("string"), F.lit(">"))
        ).alias("s"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    return Engine(graph, embeddings=emb)


@pytest.fixture(scope="session")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="session")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
