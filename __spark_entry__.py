"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry runs a bikidata-spark operator (SURVEY.md §2)
against the parquet tables at ``sf_dir``; the matching ``oracle_sql()``
entry reproduces its semantics in DuckDB SQL over the same tables.
RDF-engine oracles rebuild the identical triplization via the shared
dialect-neutral quads SQL (bikidata_spark/sources/rdfize.py).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bikidata_spark import Engine, from_string_quads
from bikidata_spark.sources.rdfize import RDFS_LABEL, rdfize_sql, string_quads

# ---------------------------------------------------------------------------
# engine cache (one graph per sf_dir per process)
# ---------------------------------------------------------------------------
_ENGINES: dict[str, Engine] = {}


def _engine(spark: SparkSession, sf_dir: str) -> Engine:
    eng = _ENGINES.get(sf_dir)
    if eng is None:
        graph = from_string_quads(string_quads(spark, sf_dir)).cache()
        emb = (
            spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select(
                F.xxhash64(F.concat(F.lit("<e/documents/"), F.col("vec_id").cast("string"), F.lit(">"))).alias("s"),
                F.col("embedding").cast("array<double>").alias("vec"),
            )
        )
        eng = Engine(graph, embeddings=emb)
        _ENGINES[sf_dir] = eng
    return eng


# ---------------------------------------------------------------------------
# oracle SQL builders
# ---------------------------------------------------------------------------
def _with_quads(body: str, recursive: bool = False) -> str:
    kw = "WITH RECURSIVE" if recursive else "WITH"
    return f"{kw} quads AS (\n{rdfize_sql()}\n)\n{body}"


def _fts_cond(terms: list[str], col: str = "o") -> str:
    """All terms occur in the same literal (mirror of operators/fts.py
    tokenization: lower + split [^a-z0-9]+)."""
    arr = "[" + ", ".join(f"'{t}'" for t in terms) + "]"
    return (
        f"{col} LIKE '\"%' AND len(list_filter({arr}, "
        f"t -> NOT list_contains(string_split_regex(lower({col}), '[^a-z0-9]+'), t))) = 0"
    )


SEG = "'\"BUILDING\"'"


# ---------------------------------------------------------------------------
# driver entry points
# ---------------------------------------------------------------------------
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: faceted boolean search over the RDF-ized corpus."""
    eng = _engine(spark, "/root/testdata/sf0.001")
    return eng.subjects_values(
        {
            "filters": [
                {"p": "<p/mktsegment>", "o": '"BUILDING"'},
                {"op": "must", "p": "fts", "o": "customer"},
            ]
        }
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    def subj(opts):
        def run(spark, sf_dir):
            return _engine(spark, sf_dir).subjects_values(opts)

        return run

    # --- filter algebra -------------------------------------------------
    q["rdf_filter_property_object"] = subj(
        {"filters": [{"p": "<p/mktsegment>", "o": '"BUILDING"'}]}
    )
    q["rdf_filter_id"] = subj({"filters": [{"p": "id", "o": "<e/customer/1>"}]})
    q["rdf_filter_object_only"] = subj({"filters": [{"p": "", "o": "<e/nation/5>"}]})
    q["rdf_filter_object_only_graph"] = subj(
        {"filters": [{"p": "", "o": "<e/nation/5>", "g": "<g/customer>"}]}
    )
    q["rdf_filter_multi_object"] = subj(
        {"filters": [{"p": "<p/nation>", "o": "<e/nation/5> <e/nation/7>"}]}
    )
    q["rdf_filter_must"] = subj(
        {
            "filters": [
                {"p": "<p/mktsegment>", "o": '"BUILDING"'},
                {"op": "must", "p": "<p/nation>", "o": "<e/nation/5>"},
            ]
        }
    )
    q["rdf_filter_should"] = subj(
        {
            "filters": [
                {"p": "<p/nation>", "o": "<e/nation/5>"},
                {"op": "should", "p": "<p/nation>", "o": "<e/nation/7>"},
            ]
        }
    )
    q["rdf_filter_not"] = subj(
        {
            "filters": [
                {"p": "<p/type>", "o": "<c/customer>"},
                {"op": "not", "p": "<p/mktsegment>", "o": '"BUILDING"'},
            ]
        }
    )
    # --- text search ----------------------------------------------------
    q["rdf_fts"] = subj({"filters": [{"p": "fts", "o": "customer 000000013"}]})
    q["rdf_fts_prop"] = subj(
        {"filters": [{"p": f"fts {RDFS_LABEL}", "o": "customer 000000013"}]}
    )
    q["rdf_fts_hop"] = subj({"filters": [{"p": "fts 1", "o": "customer 000000013"}]})
    q["rdf_regex"] = subj({"filters": [{"p": "regex", "o": '"Customer#0000000.."'}]})
    q["rdf_property_hop"] = subj(
        {"filters": [{"p": "<p/nation> 1", "o": "<e/nation/5>"}]}
    )

    # --- aggregates -----------------------------------------------------
    def facet(opts, agg):
        def run(spark, sf_dir):
            eng = _engine(spark, sf_dir)
            s_results, _ = eng.subjects(opts) if opts else (None, None)
            return eng.facet(s_results, agg)

        return run

    q["rdf_facet_nation"] = facet(
        {"filters": [{"p": "<p/mktsegment>", "o": '"BUILDING"'}]}, "<p/nation>"
    )
    q["rdf_agg_properties"] = facet(None, "properties")
    q["rdf_agg_graphs"] = facet(None, "graphs")

    # --- sort-api paging ------------------------------------------------
    def page(opts):
        def run(spark, sf_dir):
            return (
                _engine(spark, sf_dir)
                .page(opts)
                .select(F.col("pos").cast("int").alias("pos"), F.col("s_value").alias("s"))
            )

        return run

    q["rdf_page_default_order"] = page(
        {"filters": [{"p": "<p/mktsegment>", "o": '"BUILDING"'}], "size": 10, "start": 5}
    )
    q["rdf_page_order_label"] = page(
        {
            "filters": [{"p": "<p/type>", "o": "<c/customer>"}],
            "order": [{"by": "label", "dir": "desc"}],
            "size": 10,
            "start": 3,
        }
    )
    q["rdf_page_order_property"] = page(
        {
            "filters": [{"p": "<p/mktsegment>", "o": '"BUILDING"'}],
            "order": [{"by": "property", "prop": "<p/acctbal>"}],
            "size": 10,
        }
    )
    q["rdf_page_order_object_label"] = page(
        {
            "filters": [{"p": "<p/mktsegment>", "o": '"BUILDING"'}],
            "order": [{"by": "object_label", "via": "<p/nation>"}],
            "size": 10,
        }
    )
    q["rdf_page_order_natural"] = page(
        {
            "filters": [{"p": "<p/type>", "o": "<c/part>"}],
            "order": [{"by": "property", "prop": "<p/size>", "natural": True}],
            "size": 15,
        }
    )

    # --- paths ----------------------------------------------------------
    def paths(opts, prop):
        def run(spark, sf_dir):
            return _engine(spark, sf_dir).paths_values(opts, prop)

        return run

    q["rdf_paths"] = paths(
        {"filters": [{"p": "<p/mktsegment>", "o": '"BUILDING"'}]}, "<p/parent>"
    )

    # --- introspection --------------------------------------------------
    def spo_run(spark, sf_dir):
        return _engine(spark, sf_dir).spo(None, "<p/nation>", "<e/nation/5>")

    q["rdf_spo"] = spo_run

    def props_run(spark, sf_dir):
        return _engine(spark, sf_dir).properties()

    q["rdf_properties"] = props_run

    def cbp_run(spark, sf_dir):
        return _engine(spark, sf_dir).count_by_property("<p/mktsegment>")

    q["rdf_count_by_property"] = cbp_run

    def total_run(spark, sf_dir):
        eng = _engine(spark, sf_dir)
        return eng.graph.triples.agg(F.count_distinct("s").alias("total"))

    q["rdf_total"] = total_run

    # --- semantic (vector) filter --------------------------------------
    def semantic_run(spark, sf_dir):
        eng = _engine(spark, sf_dir)
        qvec = [float(x) for x in eng.embeddings.filter("s = xxhash64('<e/documents/0>')").first()["vec"]]
        subj, _ = eng._semantic_filter({"vector": qvec}, "", None)
        # map hashes back: semantic subjects are synthetic doc IRIs
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            F.xxhash64(
                F.concat(F.lit("<e/documents/"), F.col("vec_id").cast("string"), F.lit(">"))
            ).alias("s"),
            F.concat(F.lit("<e/documents/"), F.col("vec_id").cast("string"), F.lit(">")).alias("iri"),
        )
        return subj.join(emb, "s").select(F.col("iri").alias("s"))

    q["rdf_semantic"] = semantic_run

    return q


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

    o["rdf_filter_property_object"] = _with_quads(
        f"SELECT DISTINCT s FROM quads WHERE p = '<p/mktsegment>' AND o = {SEG}"
    )
    o["rdf_filter_id"] = _with_quads(
        "SELECT DISTINCT s FROM quads WHERE s = '<e/customer/1>'"
    )
    o["rdf_filter_object_only"] = _with_quads(
        "SELECT DISTINCT s FROM quads WHERE o = '<e/nation/5>'"
    )
    o["rdf_filter_object_only_graph"] = _with_quads(
        "SELECT DISTINCT s FROM quads WHERE o = '<e/nation/5>' AND g = '<g/customer>'"
    )
    o["rdf_filter_multi_object"] = _with_quads(
        "SELECT DISTINCT s FROM quads WHERE p = '<p/nation>' AND o IN ('<e/nation/5>', '<e/nation/7>')"
    )
    o["rdf_filter_must"] = _with_quads(
        f"""SELECT DISTINCT s FROM quads WHERE p = '<p/mktsegment>' AND o = {SEG}
INTERSECT
SELECT DISTINCT s FROM quads WHERE p = '<p/nation>' AND o = '<e/nation/5>'"""
    )
    o["rdf_filter_should"] = _with_quads(
        """SELECT DISTINCT s FROM quads WHERE p = '<p/nation>' AND o = '<e/nation/5>'
UNION
SELECT DISTINCT s FROM quads WHERE p = '<p/nation>' AND o = '<e/nation/7>'"""
    )
    o["rdf_filter_not"] = _with_quads(
        f"""SELECT DISTINCT s FROM quads WHERE p = '<p/type>' AND o = '<c/customer>'
EXCEPT
SELECT DISTINCT s FROM quads WHERE p = '<p/mktsegment>' AND o = {SEG}"""
    )
    o["rdf_fts"] = _with_quads(
        f"SELECT DISTINCT s FROM quads WHERE {_fts_cond(['customer', '000000013'])}"
    )
    o["rdf_fts_prop"] = _with_quads(
        f"SELECT DISTINCT s FROM quads WHERE p = '{RDFS_LABEL}' AND {_fts_cond(['customer', '000000013'])}"
    )
    o["rdf_fts_hop"] = _with_quads(
        f"""SELECT DISTINCT T1.s FROM quads T0 JOIN quads T1 ON T1.o = T0.s
WHERE {_fts_cond(['customer', '000000013'], 'T0.o')}"""
    )
    o["rdf_regex"] = _with_quads(
        """SELECT DISTINCT s FROM quads WHERE o LIKE '"%' AND regexp_full_match(o, '"Customer#0000000.."')"""
    )
    o["rdf_property_hop"] = _with_quads(
        """SELECT DISTINCT T1.s FROM quads T0 JOIN quads T1 ON T1.o = T0.s
WHERE T0.p = '<p/nation>' AND T0.o = '<e/nation/5>'"""
    )
    o["rdf_facet_nation"] = _with_quads(
        f""", s_results AS (SELECT DISTINCT s FROM quads WHERE p = '<p/mktsegment>' AND o = {SEG})
SELECT COUNT(T.s) AS count, T.o AS val FROM quads T JOIN s_results S ON T.s = S.s
WHERE T.p = '<p/nation>' GROUP BY T.o"""
    )
    o["rdf_agg_properties"] = _with_quads(
        "SELECT COUNT(*) AS count, p AS val FROM quads GROUP BY p"
    )
    o["rdf_agg_graphs"] = _with_quads(
        "SELECT COUNT(*) AS count, g AS val FROM quads GROUP BY g"
    )

    # sort-api pages
    label_pref = f"""
labels AS (
  SELECT S.s, lower(trim(regexp_extract(T.o, '^"(.+)"', 1))) AS sort_label
  FROM s_results S JOIN quads T ON T.s = S.s AND T.p = '{RDFS_LABEL}'
),
pref AS (
  SELECT s, sort_label FROM (
    SELECT s, sort_label, row_number() OVER (PARTITION BY s ORDER BY sort_label) AS rn FROM labels
  ) WHERE rn = 1
)"""

    def page_sql(s_results_sql: str, pref_sql: str, order_by: str, size: int, start: int) -> str:
        return _with_quads(
            f""", s_results AS ({s_results_sql}),{pref_sql},
page AS (
  SELECT S.s, P.sort_label FROM s_results S LEFT JOIN pref P ON P.s = S.s
  ORDER BY {order_by} LIMIT {size} OFFSET {start}
)
SELECT CAST(row_number() OVER (ORDER BY {order_by.replace('S.s', 's')}) AS INT) AS pos, s FROM page"""
        )

    building = f"SELECT DISTINCT s FROM quads WHERE p = '<p/mktsegment>' AND o = {SEG}"
    customers = "SELECT DISTINCT s FROM quads WHERE p = '<p/type>' AND o = '<c/customer>'"
    parts = "SELECT DISTINCT s FROM quads WHERE p = '<p/type>' AND o = '<c/part>'"

    o["rdf_page_default_order"] = _with_quads(
        f""", s_results AS ({building}),
page AS (SELECT s FROM s_results ORDER BY s LIMIT 10 OFFSET 5)
SELECT CAST(row_number() OVER (ORDER BY s) AS INT) AS pos, s FROM page"""
    )
    o["rdf_page_order_label"] = page_sql(
        customers,
        label_pref,
        "(sort_label IS NULL) ASC, sort_label DESC, S.s ASC",
        10,
        3,
    )
    prop_pref = label_pref.replace(f"T.p = '{RDFS_LABEL}'", "T.p = '<p/acctbal>'")
    o["rdf_page_order_property"] = page_sql(
        building, prop_pref, "(sort_label IS NULL) ASC, sort_label ASC, S.s ASC", 10, 0
    )
    objlabel_pref = f"""
labels AS (
  SELECT S.s, lower(trim(regexp_extract(T2.o, '^"(.+)"', 1))) AS sort_label
  FROM s_results S
  JOIN quads T1 ON T1.s = S.s AND T1.p = '<p/nation>'
  JOIN quads T2 ON T2.s = T1.o AND T2.p = '{RDFS_LABEL}'
),
pref AS (
  SELECT s, sort_label FROM (
    SELECT s, sort_label, row_number() OVER (PARTITION BY s ORDER BY sort_label) AS rn FROM labels
  ) WHERE rn = 1
)"""
    o["rdf_page_order_object_label"] = page_sql(
        building, objlabel_pref, "(sort_label IS NULL) ASC, sort_label ASC, S.s ASC", 10, 0
    )
    size_pref = (
        label_pref.replace(f"T.p = '{RDFS_LABEL}'", "T.p = '<p/size>'")
        + """,
prefn AS (
  SELECT s, sort_label,
         TRY_CAST(NULLIF(regexp_extract(sort_label, '^(\\d+)', 1), '') AS BIGINT) AS num_prefix
  FROM pref
)"""
    )
    o["rdf_page_order_natural"] = _with_quads(
        f""", s_results AS ({parts}),{size_pref},
page AS (
  SELECT S.s, N.sort_label, N.num_prefix FROM s_results S LEFT JOIN prefn N ON N.s = S.s
  ORDER BY (sort_label IS NULL) ASC, (num_prefix IS NULL) ASC, num_prefix ASC, sort_label ASC, S.s ASC
  LIMIT 15 OFFSET 0
)
SELECT CAST(row_number() OVER (ORDER BY (sort_label IS NULL) ASC, (num_prefix IS NULL) ASC, num_prefix ASC, sort_label ASC, s ASC) AS INT) AS pos, s FROM page"""
    )

    o["rdf_paths"] = _with_quads(
        f""", s_results AS ({building}),
anc AS (
  SELECT T.s AS src, 1 AS pos, T.o AS ancestor FROM quads T
  WHERE T.p = '<p/parent>' AND T.s IN (SELECT s FROM s_results)
  UNION ALL
  SELECT A.src, A.pos + 1, T.o FROM anc A JOIN quads T ON T.s = A.ancestor AND T.p = '<p/parent>'
)
SELECT src AS s, CAST(pos AS INT) AS pos, ancestor FROM anc""",
        recursive=True,
    )

    o["rdf_spo"] = _with_quads(
        """SELECT s, p, o FROM (SELECT DISTINCT s, p, o FROM quads WHERE p = '<p/nation>' AND o = '<e/nation/5>')
ORDER BY s, p, o LIMIT 1000"""
    )
    o["rdf_properties"] = _with_quads(
        "SELECT p AS val, COUNT(DISTINCT s) AS count FROM quads GROUP BY p"
    )
    o["rdf_count_by_property"] = _with_quads(
        "SELECT o AS val, COUNT(DISTINCT s) AS count FROM quads WHERE p = '<p/mktsegment>' GROUP BY o"
    )
    o["rdf_total"] = _with_quads("SELECT COUNT(DISTINCT s) AS total FROM quads")

    o["rdf_semantic"] = """
WITH q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv FROM embeddings WHERE vec_id = 0)
SELECT '<e/documents/' || CAST(e.vec_id AS STRING) || '>' AS s
FROM embeddings e, q
WHERE 1.0 - list_cosine_similarity(list_transform(e.embedding, x -> CAST(x AS DOUBLE)), qv) < 0.5
"""
    return o
