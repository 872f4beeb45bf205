"""Degree statistics — the skew report every graph job reads first.

The degree distribution is the operational pre-flight for every operator
in this package: it tells you whether the grounding join needs salting,
whether neighbor/wedge joins need ``max_degree`` caps, and how hub-heavy
the crawl's link graph is. Zero-filled like the reference's size
histogram (A7, replicated in ``export/summary.py``), so downstream
plotting never interpolates missing buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sssom_curator_spark.graph._edges import symmetric_adjacency, undirected_edges

__all__ = ["degree_histogram"]


def degree_histogram(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """``(degree, n_nodes)`` over the undirected deduplicated projection,
    zero-filled from 1 to the maximum degree.

    Scale shape: one degree aggregation (map-side partials) over the
    checkpointed undirected frame, one histogram aggregation over the
    NODE-sized degree frame, and a degree-range dimension exploded from
    one row — the zero-fill join is dimension-sized. The max-degree
    scalar folds from the same degree frame (checkpointed — the
    histogram and the scalar share its blocks)."""
    und = undirected_edges(edges, src, dst)
    deg = (
        symmetric_adjacency(und)
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("degree"))
        .localCheckpoint()
    )
    hist = deg.groupBy("degree").agg(F.count(F.lit(1)).alias("_n"))
    max_deg = deg.agg(F.coalesce(F.max("degree"), F.lit(0)).alias("_m"))
    grid = max_deg.select(
        F.explode(
            F.when(F.col("_m") > 0, F.sequence(F.lit(1).cast("long"), F.col("_m")))
            .otherwise(F.array().cast("array<long>"))
        ).alias("degree")
    )
    return grid.join(hist, on="degree", how="left").select(
        "degree", F.coalesce("_n", F.lit(0)).alias("n_nodes")
    )
