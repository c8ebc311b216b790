"""bikidata-spark: a PySpark-native RDF search & data-pipeline engine.

Re-expresses the query and data-processing capabilities of
ISE-FIZKarlsruhe/bikidata (an RDF layer over DuckDB) on Apache Spark,
plus large-scale training-data pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing).
"""

from .functions.embed import BatchedProvider, HttpEmbeddingClient
from .functions.porter import porter_stem
from .graph import (
    Graph,
    build_from_iterator,
    from_string_quads,
    read_graph,
    write_graph,
    write_s_projection,
)
from .plans.query import Engine
from .serving import Serving, TimeoutError

__all__ = [
    "BatchedProvider",
    "HttpEmbeddingClient",
    "Graph",
    "Engine",
    "Serving",
    "TimeoutError",
    "build_from_iterator",
    "from_string_quads",
    "porter_stem",
    "read_graph",
    "write_graph",
    "write_s_projection",
]
