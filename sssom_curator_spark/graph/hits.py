"""Fixed-iteration HITS (hubs & authorities) over a directed link graph.

Kleinberg's complement to PageRank: authorities are pages pointed AT by
good hubs, hubs point TO good authorities — on a web crawl the pair
separates content pages from directory/navigation pages, a signal the
flat PageRank score conflates. Fixed iteration count keeps the result
deterministic and SQL-replayable (one CTE pair per iteration in the
DuckDB oracle), exactly like :mod:`sssom_curator_spark.graph.pagerank`.

Scale shape mirrors pagerank: the deduplicated edge list is checkpointed
once and persisted TWICE — src-partitioned for the authority half-step,
dst-partitioned for the hub half-step, so neither direction re-shuffles
edges per iteration; each
half-step is one equi-join + map-side-partial sum keyed on the receiving
endpoint (a 10M-in-degree hub never materializes its edge list in one
task); the L2 normalizer rides as a one-row broadcast frame — no driver
round-trip per iteration; per-step ``localCheckpoint`` keeps plans flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sssom_curator_spark.operators.textstats import stable_round

__all__ = ["hits"]


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    iterations: int = 5,
    round_to: int | None = 6,
) -> DataFrame:
    """``(node, hub, authority)`` for every endpoint. Parallel edges
    collapse; self-loops count. Scores start at 1 and are L2-normalized
    after every update (the standard formulation), so results are
    independent of graph size units. ``round_to`` rounds only the final
    frame."""
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    # Right-size the persisted frames to the graph, not the session's
    # shuffle width (guide §2.2): repartition("key") inherits
    # spark.sql.shuffle.partitions, so a 60-node graph was cached in 64
    # partitions and every half-step scanned them all — pure scheduler
    # latency. The edge frame is already materialized; ~1M edges per
    # cached partition keeps big graphs wide.
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
    n = nodes.count()
    if n == 0:
        out = nodes.select(
            "node", F.lit(0.0).alias("hub"), F.lit(0.0).alias("authority")
        ).localCheckpoint()
        nodes.unpersist()
        return out
    # TWO persisted edge copies, one per half-step key: the authority step
    # joins on src, the hub step on dst — a single src-partitioned copy
    # would force an edge-sized re-shuffle by dst every iteration.
    ep_src = e.repartition(parts, "src").persist()
    ep_src.count()
    ep_dst = e.repartition(parts, "dst").persist()
    ep_dst.count()

    def _l2(df: DataFrame, col: str) -> DataFrame:
        # Checkpoint the RAW half-step, not the normalized one: the raw
        # frame (an edge-sized join + aggregate) has two consumers — the
        # norm aggregate and the normalized projection — and would
        # otherwise execute twice inside the materialization job. The
        # normalized frame is a lazy division over checkpoint blocks.
        raw = df.localCheckpoint()
        norm = raw.agg(F.sqrt(F.sum(F.col(col) * F.col(col))).alias("_norm"))
        return (
            raw.crossJoin(F.broadcast(norm))
            .select(
                "node",
                F.when(F.col("_norm") > 0, F.col(col) / F.col("_norm"))
                .otherwise(F.lit(0.0))
                .alias(col),
            )
        )

    hubs = nodes.select("node", F.lit(1.0).alias("hub")).localCheckpoint()
    auths = nodes.select("node", F.lit(1.0).alias("authority"))
    for _ in range(iterations):
        a_raw = (
            ep_src.join(hubs, on=ep_src["src"] == hubs["node"])
            .groupBy("dst")
            .agg(F.sum("hub").alias("_a"))
        )
        auths = _l2(
            nodes.join(a_raw, on=nodes["node"] == a_raw["dst"], how="left").select(
                "node", F.coalesce("_a", F.lit(0.0)).alias("authority")
            ),
            "authority",
        )
        h_raw = (
            ep_dst.join(auths, on=ep_dst["dst"] == auths["node"])
            .groupBy("src")
            .agg(F.sum("authority").alias("_h"))
        )
        hubs = _l2(
            nodes.join(h_raw, on=nodes["node"] == h_raw["src"], how="left").select(
                "node", F.coalesce("_h", F.lit(0.0)).alias("hub")
            ),
            "hub",
        )
    out = hubs.join(auths, on="node")
    if round_to is not None:
        out = out.select(
            "node",
            stable_round(F.col("hub"), round_to).alias("hub"),
            stable_round(F.col("authority"), round_to).alias("authority"),
        )
    out = out.localCheckpoint()
    nodes.unpersist()
    ep_src.unpersist()
    ep_dst.unpersist()
    return out
