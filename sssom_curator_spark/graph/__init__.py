"""Graph operators: connected components, transitive closure, PageRank."""

from sssom_curator_spark.graph.closure import transitive_closure
from sssom_curator_spark.graph.components import connected_components
from sssom_curator_spark.graph.pagerank import pagerank

__all__ = ["connected_components", "pagerank", "transitive_closure"]
