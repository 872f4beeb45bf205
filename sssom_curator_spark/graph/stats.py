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

__all__ = ["degree_histogram", "k_core"]


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


def k_core(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iterations: int = 50,
) -> DataFrame:
    """The k-core: iteratively peel nodes of degree < k until a fixpoint —
    the dense-substructure extractor (spam/link-farm cliques sit in high
    cores; a mapping-graph 2-core isolates multiply-witnessed identity
    clusters from one-off xref chains). Output: ``(node, core_degree)``
    for every surviving node, with its degree INSIDE the core.

    Scale shape per round: one degree aggregation (map-side partials)
    over the shrinking edge frame, one node-sized keep set, two semi-joins
    to restrict edges — all keyed on node ids; ``localCheckpoint`` per
    round; convergence = edge count unchanged (peeling is monotone, so
    the count alone is a sound fixpoint test — no checksum needed).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cur = undirected_edges(edges, src, dst)
    n_edges = cur.count()
    for _ in range(max_iterations):
        deg = symmetric_adjacency(cur).groupBy("n").agg(
            F.count(F.lit(1)).alias("d")
        )
        keep = deg.filter(F.col("d") >= k).select(F.col("n").alias("node")).localCheckpoint()
        nxt = (
            cur.join(keep, on=cur["u"] == keep["node"], how="left_semi")
            .join(keep, on=cur["v"] == keep["node"], how="left_semi")
            .localCheckpoint()
        )
        n_next = nxt.count()
        cur = nxt
        if n_next == n_edges:
            break
        n_edges = n_next
    return (
        symmetric_adjacency(cur)
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .select(F.col("n").alias("node"), "core_degree")
    )
