"""Triple insert / delete.

Reference counterpart: ``handle_insert`` / ``handle_delete``
(reference query.py:468-617) — validated single-statement mutations
against the DuckDB store. Spark has no in-place mutation: the engine is
immutable-DataFrame-based, so mutations return a NEW Graph (union /
anti-join), and the persistent form is append-only parquet with
tombstones (see bikidata_spark/streaming/mutations.py for the streaming
ingest path). At 100 TB an anti-join delete is a broadcast of the
(small) tombstone set against the quad table — no rewrite of
untouched partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph, term_hash


def _quads_df(graph: Graph, data: list[dict], require_o: bool = True) -> DataFrame:
    rows = [
        (item.get("s"), item.get("p"), item.get("o"), item.get("g", "") or "")
        for item in data
    ]
    return graph.spark.createDataFrame(rows, "s string, p string, o string, g string")


def _validate_insert(data: list[dict]) -> str | None:
    """Reference validation rules (query.py:538-546)."""
    for item in data:
        s, p, o = item.get("s"), item.get("p"), item.get("o")
        if not s or not p or not o:
            return "Insert triple missing s, p, or o"
        if not (s.startswith("<") or s.startswith("_:")):
            return "Subject must be an IRI or BlankNode"
        if not (p.startswith("<") and p.endswith(">")):
            return "Predicate must be an IRI"
        if not (o.startswith('"') or o.startswith("<") or o.startswith("_:")):
            return "Object must be a literal, IRI or a BlankNode"
    return None


def insert(graph: Graph, data: list[dict]) -> tuple[Graph, dict]:
    """Insert triples; refuses duplicates (reference query.py:547-551).
    Returns (new_graph, result_dict)."""
    err = _validate_insert(data)
    if err:
        return graph, {"error": err}
    quads = _quads_df(graph, data)
    hashed = quads.select(
        term_hash("s").alias("s"),
        term_hash("p").alias("p"),
        term_hash("o").alias("o"),
        term_hash("g").alias("g"),
    )
    n_existing = hashed.join(graph.triples, ["s", "p", "o", "g"], "left_semi").count()
    if n_existing > 0:
        return graph, {"error": "Triple already exists, skipping insert"}

    new_terms = (
        quads.select(F.col("s").alias("value"))
        .unionAll(quads.select("p"))
        .unionAll(quads.select("o"))
        .unionAll(quads.select("g"))
        .distinct()
        .select(
            term_hash("value").alias("hash"),
            "value",
            F.col("value").startswith('"').alias("is_literal"),
        )
        .join(graph.terms.select("hash"), "hash", "left_anti")
    )
    # COLLECT the (request-sized) new terms and union a LocalRelation:
    # unioning the anti-join expression itself would nest graph.terms
    # inside the new terms frame, DOUBLING the plan per mutation — at
    # ~14 chained mutations the 2^N-scan analysis ran for minutes
    new_rows = new_terms.collect()
    terms = graph.terms
    if new_rows:
        from ..graph import align_terms

        # align_terms: a store-read dictionary carries the derived
        # bucket partition column — derive it for the new rows too
        # (a raw positional union against the 4-column schema fails)
        terms = terms.unionAll(
            align_terms(
                terms,
                graph.spark.createDataFrame(
                    new_rows, "hash long, value string, is_literal boolean"
                ),
            )
        )
    new_graph = Graph(triples=graph.triples.unionAll(hashed), terms=terms)
    return new_graph, {"triples_inserted": len(data), "terms_inserted": len(new_rows)}


def _hash_to_long(h) -> int:
    """Normalize a client-supplied term hash to Spark's signed 64-bit
    id space. Accepts ints, decimal strings, or hex digests (reference
    clients pass ``xxh64_hexdigest`` strings, query.py:484-494);
    unsigned values wrap to their signed twin."""
    if isinstance(h, bool) or not isinstance(h, (int, str)):
        raise ValueError(f"not a term hash: {h!r}")
    if isinstance(h, int):
        v = h
    else:
        s = h.strip().lower()
        try:
            v = int(s, 10)
        except ValueError:
            try:
                v = int(s.removeprefix("0x"), 16)
            except ValueError:
                raise ValueError(f"not a term hash: {h!r}") from None
    if v >= 1 << 64 or v < -(1 << 63):
        raise ValueError(f"hash out of 64-bit range: {h!r}")
    return v - (1 << 64) if v >= 1 << 63 else v


_EMPTY_G: dict[int, int] = {}


def _empty_g_hash(spark) -> int:
    """Hash of the empty graph term — the store's default ``g``."""
    key = id(spark)
    if key not in _EMPTY_G:
        _EMPTY_G[key] = spark.range(1).select(term_hash(F.lit("")).alias("h")).first()["h"]
    return _EMPTY_G[key]


def delete_hashes(graph: Graph, data: list[dict]) -> tuple[Graph, dict]:
    """Hash-addressed delete — the reference's ``are_hashes=True`` path
    (query.py:476-520): items carry term HASHES, not lexical forms.
    Like the reference, no existence check is made (a non-matching hash
    deletes zero rows), terms are never garbage-collected, and an item
    without ``o`` deletes every (s, p, g) match regardless of object.
    A missing/empty ``g`` addresses the default (empty-string) graph."""
    spark = graph.spark
    empty_g = _empty_g_hash(spark)

    def g_of(d) -> int:
        g = d.get("g")
        return empty_g if g in (None, "") else _hash_to_long(g)

    with_o = [d for d in data if d.get("o") not in (None, "")]
    no_o = [d for d in data if d.get("o") in (None, "")]
    triples = graph.triples
    if with_o:
        rows = [
            (_hash_to_long(d["s"]), _hash_to_long(d["p"]), _hash_to_long(d["o"]), g_of(d))
            for d in with_o
        ]
        hashed = spark.createDataFrame(rows, "s long, p long, o long, g long")
        triples = triples.join(hashed, ["s", "p", "o", "g"], "left_anti")
    if no_o:
        rows = [(_hash_to_long(d["s"]), _hash_to_long(d["p"]), g_of(d)) for d in no_o]
        hashed = spark.createDataFrame(rows, "s long, p long, g long")
        # a USING-join moves its keys to the front (s, p, g, o); restore
        # the canonical order — a later insert unions POSITIONALLY, and
        # without this its o lands in the g column
        triples = triples.join(hashed, ["s", "p", "g"], "left_anti").select(
            "s", "p", "o", "g"
        )
    new_graph = Graph(triples=triples, terms=graph.terms)
    return new_graph, {"triples_deleted": len(data)}


def delete(graph: Graph, data: list[dict], are_hashes: bool = False) -> tuple[Graph, dict]:
    """Delete triples; a missing triple aborts the batch (reference
    query.py:477-482). Items without ``o`` delete every matching
    (s, p, g) regardless of object. ``are_hashes=True`` routes to the
    hash-addressed path (:func:`delete_hashes`)."""
    if are_hashes:
        return delete_hashes(graph, data)
    with_o = [d for d in data if d.get("o")]
    no_o = [d for d in data if not d.get("o")]
    triples = graph.triples
    n_before = None

    if with_o:
        quads = _quads_df(graph, with_o)
        hashed = quads.select(
            term_hash("s").alias("s"),
            term_hash("p").alias("p"),
            term_hash("o").alias("o"),
            term_hash("g").alias("g"),
        )
        n_match = triples.join(hashed, ["s", "p", "o", "g"], "left_semi").count()
        if n_match < len(with_o):
            return graph, {"error": "Triple does not exist, skipping delete"}
        triples = triples.join(hashed, ["s", "p", "o", "g"], "left_anti")

    if no_o:
        quads = _quads_df(graph, no_o)
        hashed = quads.select(
            term_hash("s").alias("s"),
            term_hash("p").alias("p"),
            term_hash("g").alias("g"),
        )
        n_match = triples.join(hashed, ["s", "p", "g"], "left_semi").count()
        if n_match == 0:
            return graph, {"error": "Triple does not exist, skipping delete"}
        # a USING-join moves its keys to the front (s, p, g, o); restore
        # the canonical order — a later insert unions POSITIONALLY, and
        # without this its o lands in the g column
        triples = triples.join(hashed, ["s", "p", "g"], "left_anti").select(
            "s", "p", "o", "g"
        )

    new_graph = Graph(triples=triples, terms=graph.terms)
    return new_graph, {"triples_deleted": len(data)}
