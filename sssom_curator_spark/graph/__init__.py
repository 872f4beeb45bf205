"""Graph operators: connected components, component stats, anomaly reports."""

from sssom_curator_spark.graph.components import connected_components

__all__ = ["connected_components"]
