"""bikidata-spark: a PySpark-native RDF search & data-pipeline engine.

Re-expresses the query and data-processing capabilities of
ISE-FIZKarlsruhe/bikidata (an RDF layer over DuckDB) on Apache Spark,
plus large-scale training-data pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing).
"""

from .graph import Graph, from_string_quads, read_graph, write_graph
from .plans.query import Engine

__all__ = ["Graph", "Engine", "from_string_quads", "read_graph", "write_graph"]
