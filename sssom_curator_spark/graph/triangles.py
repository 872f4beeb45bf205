"""Per-node triangle counting with degree-ordered orientation.

Triangle (clustering) structure separates genuine communities from
spam/link-farm topology in web graphs and flags suspicious dense cliques
in a mapping graph — a standard graph-quality signal the reference's
in-memory networkx analysis could compute but never at scale.

The scale problem is the hub: a naive wedge join (edges ⋈ edges on the
shared endpoint) generates deg² wedge rows — 10^14 for a 10^7-degree hub.
The classical fix (Schank & Wagner 2005; the MapReduce form in Suri &
Vassilvitskii 2011) orients every undirected edge from its
lower-``(degree, id)`` endpoint to the higher one: out-degrees are then
bounded by O(√m), every triangle has exactly ONE node with two outgoing
oriented edges (its minimum-key corner), and the wedge join closes with
ONE equi-join against the oriented edge list. All plain DataFrame
joins/aggregations — the degree/orientation shuffles, the bounded wedge
self-join, the closing equi-join, and one count aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sssom_curator_spark.graph._edges import undirected_edges

__all__ = ["triangle_counts"]


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """``(node, n_triangles)`` for EVERY endpoint of the undirected,
    deduplicated, self-loop-free projection of ``edges`` (nodes in no
    triangle report 0). Direction and multiplicity of the input are
    ignored — parallel/reverse duplicates collapse to one undirected
    edge."""
    und = undirected_edges(edges, src, dst)
    nodes = und.select(F.col("u").alias("node")).union(und.select("v")).distinct()
    # node-sized, TWO consumers (the du and dv joins) — materialize once
    deg = (
        und.select(F.col("u").alias("n"))
        .union(und.select("v"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint()
    )
    with_deg = und.join(
        deg.select(F.col("n").alias("u"), F.col("d").alias("du")), on="u"
    ).join(deg.select(F.col("n").alias("v"), F.col("d").alias("dv")), on="v")
    # orientation key: (degree, node) lexicographic — a total order both
    # endpoints agree on; `a` is the lower-key end, `kb` the other end's key
    ku = F.struct(F.col("du").alias("d"), F.col("u").alias("n"))
    kv = F.struct(F.col("dv").alias("d"), F.col("v").alias("n"))
    oriented = with_deg.select(
        F.when(ku < kv, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(ku < kv, kv).otherwise(ku).alias("kb"),
    ).localCheckpoint()  # three consumers: both wedge sides + the closing join
    # wedges at the minimum-key corner; ordering the two spokes by their
    # keys makes each wedge unique AND matches the closing edge's
    # orientation (x → y goes low-key → high-key by construction)
    w1, w2 = oriented.alias("w1"), oriented.alias("w2")
    wedges = w1.join(
        w2,
        on=[
            F.col("w1.a") == F.col("w2.a"),
            F.col("w1.kb") < F.col("w2.kb"),
        ],
    ).select(
        F.col("w1.a").alias("corner"),
        F.col("w1.kb.n").alias("x"),
        F.col("w2.kb.n").alias("y"),
    )
    closing = oriented.select(F.col("a").alias("x"), F.col("kb.n").alias("y"))
    tri = wedges.join(closing, on=["x", "y"])
    member = tri.select(
        F.explode(F.array(F.col("corner"), F.col("x"), F.col("y"))).alias("node")
    )
    counts = member.groupBy("node").agg(F.count(F.lit(1)).alias("n_triangles"))
    return nodes.join(counts, on="node", how="left").select(
        "node", F.coalesce("n_triangles", F.lit(0)).alias("n_triangles")
    )
