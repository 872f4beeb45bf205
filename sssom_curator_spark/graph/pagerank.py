"""Fixed-iteration PageRank over the link/mapping graph.

The reference has no graph-ranking operator; a web-scale KG pipeline
needs one — crawl frontier prioritization, domain authority for quality
weighting, and entity-importance priors for the grounding join all
consume it. This is the textbook damped power iteration (Page et al.
1999) with dangling-mass redistribution, run a FIXED number of rounds so
the result is deterministic and SQL-replayable (the DuckDB oracle chains
one CTE per iteration; a convergence-tested variant would tie the oracle
to float-epsilon behavior). One chassis serves the uniform, weighted,
and personalized (seed-teleport) variants — the uniform case is the
seeded case with t = 1/N, so every scale fix lands once.

Scale shape:
- the edge frame joined with out-degrees is computed ONCE, repartitioned
  on ``src`` and persisted — each iteration's rank join reuses those
  cached partitions, so the per-iteration shuffle carries only the rank
  frame (two columns per node), never the edges;
- contributions aggregate with a map-side partial ``sum`` keyed on
  ``dst`` — a 10M-in-degree hub page never materializes its in-edge list
  in one task;
- the dangling-node SET is loop-invariant and materialized once; its
  per-iteration rank mass rides as a one-row broadcast frame cross-joined
  into the update — no driver round-trip per iteration;
- per-iteration ``localCheckpoint`` keeps the plan flat (same discipline
  as :mod:`sssom_curator_spark.graph.components`); the checkpoint blocks
  are NODE-sized (two columns), the explicit edge/node persists are
  released before returning, and superseded iteration checkpoints are
  reclaimed by Spark's ContextCleaner as their Datasets drop
  (plan-pinned in ``tests/test_plans.py::TestPageRankEdgeReuse``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sssom_curator_spark.operators.textstats import stable_round

__all__ = ["pagerank", "personalized_pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    weight: str | None = None,
    seeds: DataFrame | None = None,
    seed_col: str = "node",
    damping: float = 0.85,
    iterations: int = 5,
    round_to: int | None = 6,
) -> DataFrame:
    """Rank every node of the directed graph: ``(node, rank)``.

    Without ``weight``, parallel edges are collapsed (rank flows once per
    distinct edge); with ``weight`` (a numeric column — e.g. the
    ``n_links`` of a domain link graph), each source distributes rank
    proportionally to edge weight (parallel edges sum; non-positive
    weights are dropped). Self-loops count like any other edge.

    Without ``seeds``, teleportation is uniform: ranks start at 1/N and
    dangling mass spreads evenly. With ``seeds`` (a one-column frame of
    node ids), teleportation AND dangling mass return to the matched
    seeds uniformly — random walk with restart; unmatched seeds are
    ignored and ``ValueError`` is raised when none matches (including
    the empty-graph case, where every seed is trivially unmatched).

    Ranks sum to 1 after every iteration. ``round_to`` rounds the FINAL
    ranks only — internal iterations keep full precision; pass ``None``
    for raw doubles.
    """
    if weight is None:
        e = (
            edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
            .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
            .distinct()
            .withColumn("_w", F.lit(1.0))
        )
    else:
        e = (
            edges.select(
                F.col(src).alias("src"),
                F.col(dst).alias("dst"),
                F.col(weight).cast("double").alias("_w"),
            )
            .filter(
                F.col("src").isNotNull()
                & F.col("dst").isNotNull()
                & (F.col("_w") > 0)
            )
            .groupBy("src", "dst")
            .agg(F.sum("_w").alias("_w"))
        )
    # Materialize the edge projection ONCE: four consumers follow (both
    # node-set unions, the out-degree aggregation, the partitioned copy),
    # and when the edge list derives from an expensive upstream chain
    # (html → links → domain graph) each consumer would re-run it. The
    # edge list is graph-sized — bounded, unlike the corpus it came from.
    e = e.localCheckpoint()
    # Right-size the persisted frames to the GRAPH, not the session's
    # shuffle width (guide §2.2): repartition("key") inherits
    # spark.sql.shuffle.partitions, so a 60-node domain graph was cached
    # in 64 partitions and every one of the 5 iterations scanned 64 cached
    # partitions per stage — pure scheduler latency. The edge frame is
    # already materialized, so its count is a cheap metadata-ish job;
    # ~1M edges per cached partition keeps big graphs wide.
    m = e.count()
    width = e.sparkSession.sparkContext.defaultParallelism
    parts = max(1, min(width, m // 1_000_000 + 1))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select("dst"))
        .distinct()
        .repartition(parts, "node")
        .persist()
    )
    n = nodes.count()  # also pins the node cache

    tele = None
    if seeds is not None:
        # validate BEFORE the empty-graph return: in an empty graph every
        # seed is unmatched and the documented ValueError must still fire
        seed_nodes = seeds.select(F.col(seed_col).alias("node")).distinct()
        matched = nodes.join(seed_nodes, on="node", how="left_semi").localCheckpoint()
        ns = matched.count()
        if ns == 0:
            nodes.unpersist()
            raise ValueError("pagerank: no seed matches any graph node")
        # only seed rows carry a teleport entry; non-seeds read as 0 via
        # the left join + coalesce in the init/update below
        tele = matched.select("node", F.lit(1.0 / ns).alias("_t"))

    if n == 0:
        out = nodes.select("node", F.lit(0.0).alias("rank")).localCheckpoint()
        nodes.unpersist()
        return out

    outdeg = e.groupBy("src").agg(F.sum("_w").alias("_deg"))
    # One persisted, src-partitioned copy of (src, dst, _w, _deg): every
    # iteration reads these cached partitions; only ranks shuffle per round.
    ewd = e.join(outdeg, on="src").repartition(parts, "src").persist()
    ewd.count()
    # WHICH nodes dangle is loop-invariant (only their rank mass changes):
    # materialize the node-sized dangling set once instead of re-running
    # the edge-sized out-degree aggregation + anti-join every iteration.
    dangling = nodes.join(
        outdeg, on=nodes["node"] == outdeg["src"], how="left_anti"
    ).localCheckpoint()

    if tele is None:
        ranks = nodes.select("node", F.lit(1.0 / n).alias("rank")).localCheckpoint()
    else:
        ranks = (
            nodes.join(tele, on="node", how="left")
            .select("node", F.coalesce("_t", F.lit(0.0)).alias("rank"))
            .localCheckpoint()
        )
    base = (1.0 - damping) / n
    for _ in range(iterations):
        # dangling mass rides as a one-row broadcast frame cross-joined
        # into the update — NOT a driver-side .first(): a blocking scalar
        # collect per iteration serializes the loop on driver round-trips.
        # One job per iteration (the checkpoint) executes everything.
        dang_df = (
            ranks.join(dangling, on="node", how="left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang"))
        )
        contrib = (
            ewd.join(ranks, on=ewd["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("_w") / F.col("_deg")).alias("_in"))
        )
        updated = nodes.join(
            contrib, on=nodes["node"] == contrib["dst"], how="left"
        ).crossJoin(F.broadcast(dang_df))
        if tele is None:
            rank_expr = F.lit(base) + F.lit(damping) * (
                F.coalesce(F.col("_in"), F.lit(0.0))
                + F.col("_dang") / F.lit(float(n))
            )
        else:
            updated = updated.join(tele, on="node", how="left")
            t = F.coalesce(F.col("_t"), F.lit(0.0))
            rank_expr = (F.lit(1.0) - F.lit(damping)) * t + F.lit(damping) * (
                F.coalesce(F.col("_in"), F.lit(0.0)) + F.col("_dang") * t
            )
        ranks = updated.select("node", rank_expr.alias("rank")).localCheckpoint()
    out = ranks
    if round_to is not None:
        out = ranks.select("node", stable_round(F.col("rank"), round_to).alias("rank"))
        out = out.localCheckpoint()
    nodes.unpersist()
    ewd.unpersist()
    return out


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    seed_col: str = "node",
    weight: str | None = None,
    damping: float = 0.85,
    iterations: int = 5,
    round_to: int | None = 6,
) -> DataFrame:
    """Random walk with restart — :func:`pagerank` with ``seeds``
    required. Kept as a named entry point for the KG-proximity use case
    (relevance relative to trusted domains, a seed ontology branch, or a
    query entity); all behavior, including weighted edges, comes from the
    shared chassis."""
    return pagerank(
        edges,
        src,
        dst,
        weight=weight,
        seeds=seeds,
        seed_col=seed_col,
        damping=damping,
        iterations=iterations,
        round_to=round_to,
    )
