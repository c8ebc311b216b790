"""Relational → RDF triplization.

The reference engine ingests Wikidata N-Triples dumps (reference
main.py:70-115, scripts/index.py). To exercise the same query surface on
the driver's TPC-H-ish parquet tables we map rows to quads with a FIXED,
dialect-neutral SQL mapping: the SAME SQL text runs on Spark (over temp
views of the parquet files) and on DuckDB (oracle side), which makes the
triplization bit-identical by construction on both engines.

Conventions (SURVEY.md §6):
- entity IRI:   <e/{table}/{key}>
- predicate:    <p/{column}> (entity label uses rdfs:label)
- class:        <c/{table}> via <p/type>
- graph:        <g/{table}>
- FK objects are entity IRIs; other values are literals '"lexical"' with
  fixed formatting: ints via CAST..VARCHAR, doubles via DECIMAL(18,2),
  timestamps via CAST(ts AS DATE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

RDFS_LABEL = "<http://www.w3.org/2000/01/rdf-schema#label>"

# (table, key_expr, [(predicate, object_sql_expr)])
_MAPPING: list[tuple[str, str, list[tuple[str, str]]]] = [
    (
        "region",
        "CAST(r_regionkey AS STRING)",
        [
            (RDFS_LABEL, "'\"' || r_name || '\"'"),
            ("<p/type>", "'<c/region>'"),
        ],
    ),
    (
        "nation",
        "CAST(n_nationkey AS STRING)",
        [
            (RDFS_LABEL, "'\"' || n_name || '\"'"),
            ("<p/region>", "'<e/region/' || CAST(n_regionkey AS STRING) || '>'"),
            ("<p/parent>", "'<e/region/' || CAST(n_regionkey AS STRING) || '>'"),
            ("<p/type>", "'<c/nation>'"),
        ],
    ),
    (
        "customer",
        "CAST(c_custkey AS STRING)",
        [
            (RDFS_LABEL, "'\"' || c_name || '\"'"),
            ("<p/nation>", "'<e/nation/' || CAST(c_nationkey AS STRING) || '>'"),
            ("<p/parent>", "'<e/nation/' || CAST(c_nationkey AS STRING) || '>'"),
            ("<p/mktsegment>", "'\"' || c_mktsegment || '\"'"),
            ("<p/acctbal>", "'\"' || CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS STRING) || '\"'"),
            ("<p/type>", "'<c/customer>'"),
        ],
    ),
    (
        "supplier",
        "CAST(s_suppkey AS STRING)",
        [
            (RDFS_LABEL, "'\"' || s_name || '\"'"),
            ("<p/nation>", "'<e/nation/' || CAST(s_nationkey AS STRING) || '>'"),
            ("<p/acctbal>", "'\"' || CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS STRING) || '\"'"),
            ("<p/type>", "'<c/supplier>'"),
        ],
    ),
    (
        "part",
        "CAST(p_partkey AS STRING)",
        [
            (RDFS_LABEL, "'\"' || p_name || '\"'"),
            ("<p/brand>", "'\"' || p_brand || '\"'"),
            ("<p/parttype>", "'\"' || p_type || '\"'"),
            ("<p/size>", "'\"' || CAST(p_size AS STRING) || '\"'"),
            ("<p/retailprice>", "'\"' || CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS STRING) || '\"'"),
            ("<p/type>", "'<c/part>'"),
        ],
    ),
    (
        "orders",
        "CAST(o_orderkey AS STRING)",
        [
            ("<p/customer>", "'<e/customer/' || CAST(o_custkey AS STRING) || '>'"),
            ("<p/orderstatus>", "'\"' || o_orderstatus || '\"'"),
            ("<p/totalprice>", "'\"' || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS STRING) || '\"'"),
            ("<p/orderdate>", "'\"' || CAST(CAST(o_orderdate AS DATE) AS STRING) || '\"'"),
            ("<p/orderpriority>", "'\"' || o_orderpriority || '\"'"),
            ("<p/type>", "'<c/orders>'"),
        ],
    ),
]

RDF_TABLES = [t for t, _, _ in _MAPPING]


def rdfize_sql() -> str:
    """Dialect-neutral SELECT producing quads (s, p, o, g) from the
    pre-registered relational views. Runs unchanged on Spark and DuckDB."""
    selects = []
    for table, key, preds in _MAPPING:
        subj = f"'<e/{table}/' || {key} || '>'"
        for pred, obj in preds:
            selects.append(
                f"SELECT {subj} AS s, '{pred}' AS p, {obj} AS o, '<g/{table}>' AS g FROM {table}"
            )
    return "\nUNION ALL\n".join(selects)


def oracle_quads_cte() -> str:
    """The quads CTE body for DuckDB oracle SQL strings."""
    return f"quads AS (\n{rdfize_sql()}\n)"


def register_tables(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    for t in tables or RDF_TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def string_quads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quads as strings for the test corpus at ``sf_dir``.

    Semantically identical to ``rdfize_sql()`` (the oracle contract),
    but restructured for Spark: ONE scan per table with an
    array<struct> explode instead of one union branch per predicate
    (6 scans instead of ~36; 2.6× faster at sf0.1). The object
    expressions are the same SQL strings, so output is bit-identical."""
    from functools import reduce

    from pyspark.sql import functions as F

    register_tables(spark, sf_dir)
    dfs = []
    for table, key, preds in _MAPPING:
        tdf = spark.table(table)
        subj = F.expr(f"'<e/{table}/' || {key} || '>'")
        pairs = F.array(
            *[
                F.struct(F.lit(pred).alias("p"), F.expr(obj).alias("o"))
                for pred, obj in preds
            ]
        )
        dfs.append(
            tdf.select(
                subj.alias("s"),
                F.explode(pairs).alias("po"),
                F.lit(f"<g/{table}>").alias("g"),
            ).select("s", F.col("po.p").alias("p"), F.col("po.o").alias("o"), "g")
        )
    # no repartition here: the cached graph keeps the source's natural
    # partitioning (measured: fanning tiny local inputs out to 32
    # partitions taxes every downstream query with task overhead; real
    # clusters get parallelism from the many input splits themselves)
    return reduce(lambda a, b: a.unionAll(b), dfs)
