"""Graph operators: connected components, transitive closure, PageRank,
HITS, triangle counting, neighborhood similarity, label propagation."""

from sssom_curator_spark.graph.closure import bounded_reachability, transitive_closure
from sssom_curator_spark.graph.components import connected_components
from sssom_curator_spark.graph.hits import hits
from sssom_curator_spark.graph.labelprop import label_propagation
from sssom_curator_spark.graph.neighbors import neighbor_jaccard
from sssom_curator_spark.graph.pagerank import pagerank, personalized_pagerank
from sssom_curator_spark.graph.stats import degree_histogram
from sssom_curator_spark.graph.triangles import triangle_counts

__all__ = [
    "bounded_reachability",
    "degree_histogram",
    "connected_components",
    "hits",
    "label_propagation",
    "neighbor_jaccard",
    "pagerank",
    "personalized_pagerank",
    "transitive_closure",
    "triangle_counts",
]
