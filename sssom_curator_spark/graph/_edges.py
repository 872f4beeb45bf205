"""Shared edge-hygiene projections for the graph operator family."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["symmetric_adjacency", "undirected_edges"]


def undirected_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Canonical undirected projection: ``(u, v)`` with ``u < v``,
    null endpoints and self-loops dropped, reverse/parallel duplicates
    collapsed. Returned CHECKPOINTED — every consumer (degree counts,
    adjacency symmetrization, wedge joins) reads the materialized blocks
    instead of re-running the dedup shuffle."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(
            F.col("u").isNotNull() & F.col("v").isNotNull() & (F.col("u") != F.col("v"))
        )
        .distinct()
        .localCheckpoint()
    )


def symmetric_adjacency(und: DataFrame) -> DataFrame:
    """Both orientations of a canonical undirected edge frame as
    ``(n, m)`` rows — the join-ready adjacency every neighborhood
    operator consumes. Pure projection over the (checkpointed)
    undirected frame; no shuffle."""
    return und.select(F.col("u").alias("n"), F.col("v").alias("m")).union(
        und.select(F.col("v"), F.col("u"))
    )
