"""Composed training-data pipeline: the operators wired end-to-end.

The individual cleaning stages (quality scoring, dedup, text analysis)
live in their own modules; real corpus preparation chains them. This
module provides that composition as one declarative plan so Catalyst
optimizes across stage boundaries (e.g. the quality semi-join and the
dedup-survivor semi-join collapse into one scan pipeline — no
intermediate materialization between "stages" as a task-graph system
would have).

Scale notes (100 TB): both stage outputs join back to the corpus as
left-semi joins on the doc id — no row explosion, map-side combinable
aggregations only, and the corpus is scanned twice (once per derived
set) plus once for the final projection; a task-DAG pipeline with
materialized intermediates would write the corpus out between stages
instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import quality_score, token_count
from .dedup import exact_dedup


def clean_corpus(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Documents that (a) pass the quality heuristics and (b) are the
    surviving representative of their exact-duplicate class. Returns
    (id, n_tokens) — the cleaned corpus manifest with its token budget.
    """
    ok = (
        quality_score(df, id_col, text_col)
        .filter(F.col("quality_ok"))
        .select(F.col(id_col))
    )
    survivors = exact_dedup(df, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return (
        token_count(df, id_col, text_col)
        .join(ok, id_col, "left_semi")
        .join(survivors, id_col, "left_semi")
        .select(F.col(id_col), "n_tokens")
    )
