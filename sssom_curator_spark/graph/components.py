"""Connected components via alternating large-star / small-star joins (G1).

The reference calls ``nx.connected_components`` over the in-memory positive
mapping graph (export/charts.py:46-66) and uses single-source reachability
for the mutual-mapping filter (predict/lexical.py:403-456). Neither
survives a 10^12-node graph; this module implements the two-phase
large-star/small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) with plain DataFrame joins/aggregations:

- O(log n) rounds instead of O(diameter) label propagation;
- every round is two self-joins + two aggregations on the edge list —
  no ``collect_list`` (a 10M-degree hub node never materializes its
  neighborhood in one task);
- per-round ``localCheckpoint`` truncates lineage so plans stay flat;
- convergence test = count + order-insensitive checksum of the edge set
  (two scalar aggregates, no full comparison shuffle).

String node ids (CURIEs) are dictionary-encoded to longs once at the start
(``monotonically_increasing_id`` — no global sort), and the final component
representative is the *minimum CURIE string* per component, which makes the
output deterministic regardless of internal id assignment. That
representative is exactly the north rule's canonical CURIE: the
canonicalization step maps every member to its component rep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "canonicalize_mappings"]


def _symmetrize(edges: DataFrame) -> DataFrame:
    rev = edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    return edges.union(rev)


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u})."""
    sym = _symmetrize(edges)
    mins = sym.groupBy("u").agg(F.min("v").alias("min_v"))
    mins = mins.select("u", F.least("u", "min_v").alias("m"))
    return (
        sym.filter(F.col("v") > F.col("u"))
        .join(mins, on="u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges to parent pointers (u > v) and connect all small
    neighbors (and u itself) to the minimum."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("min_v"))
    mins = mins.select("u", F.least("u", "min_v").alias("m"))
    relinked = (
        oriented.join(mins, on="u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select(F.col("u"), F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    return relinked


def _checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal sum: order-insensitive and overflow-proof under ANSI mode
        F.coalesce(F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def _driver_union_find(rows: list) -> list[tuple[str, str]]:
    """Small-graph fast path: plain union-find on collected edges."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    members: dict[str, list[str]] = {}
    for node in parent:
        members.setdefault(find(node), []).append(node)
    out = []
    for group in members.values():
        rep = min(group)
        out.extend((node, rep) for node in group)
    return out


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iterations: int = 25,
    small_graph_threshold: int = 100_000,
) -> DataFrame:
    """Label every node with its component representative.

    Input: an edge DataFrame with string endpoint columns ``src``/``dst``.
    Output: ``(node:string, component:string)`` covering every endpoint,
    where ``component`` is the lexicographically smallest CURIE in the
    node's component.

    Edge sets under ``small_graph_threshold`` collect to the driver and run
    plain union-find — the same local-relation shortcut Catalyst applies to
    tiny inputs; the iterative distributed algorithm only pays off past
    memory scale. Output is identical either way (both pick the min-CURIE
    representative).
    """
    spark = edges.sparkSession
    pairs = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a").isNotNull() & F.col("b").isNotNull()
    )
    if small_graph_threshold > 0:
        sample = pairs.limit(small_graph_threshold + 1).collect()
        if len(sample) <= small_graph_threshold:
            import pandas as pd

            labeled = _driver_union_find([(r["a"], r["b"]) for r in sample])
            # Arrow path: a plain-list createDataFrame would re-evaluate
            # through pickle python workers on every downstream use.
            pdf = pd.DataFrame(labeled or [], columns=["node", "component"])
            return spark.createDataFrame(pdf, "node string, component string")
    nodes = (
        pairs.select(F.col("a").alias("curie"))
        .union(pairs.select("b"))
        .distinct()
        .withColumn("id", F.monotonically_increasing_id())
        .persist()
    )
    nodes.count()  # pin ids: monotonically_increasing_id must be computed once

    e = (
        pairs.join(nodes.withColumnRenamed("curie", "a").withColumnRenamed("id", "u"), on="a")
        .join(nodes.withColumnRenamed("curie", "b").withColumnRenamed("id", "v"), on="b")
        .select("u", "v")
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )

    prev = _checksum(e)
    for _ in range(max_iterations):
        e = _small_star(_large_star(e)).localCheckpoint()
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur

    # Converged state is a forest of stars: every edge is (member, root).
    roots = _symmetrize(e).groupBy("u").agg(F.min("v").alias("root"))
    roots = roots.select("u", F.least("u", "root").alias("root"))
    membership = (
        nodes.join(roots, nodes["id"] == roots["u"], "left")
        .select("curie", F.coalesce("root", "id").alias("root"))
    )
    # Deterministic representative: min CURIE string per component.
    reps = membership.groupBy("root").agg(F.min("curie").alias("component"))
    out = membership.join(reps, on="root").select(F.col("curie").alias("node"), "component")
    result = out.localCheckpoint()
    nodes.unpersist()
    return result


def canonicalize_mappings(
    mappings: DataFrame,
    components: DataFrame,
    *,
    broadcast_components: bool | None = None,
) -> DataFrame:
    """Canonicalization: rewrite subject/object CURIEs to their component
    representative (north rule: union-find over skos:exactMatch edges
    collapses equivalent CURIEs). Unmatched CURIEs pass through.

    Scale note (the 10^12-document design point): this is the north-rule
    canonicalization operator, and the components frame can be derived
    from the corpus itself — in which case it is NOT broadcastable. By
    default no join strategy is forced: Catalyst/AQE broadcasts the
    component table when its runtime size is under
    ``spark.sql.autoBroadcastJoinThreshold`` (the common case — a
    label-index-sized table) and falls back to a shuffled equi-join on the
    CURIE key otherwise. Callers that KNOW the components frame is
    dimension-sized can pass ``broadcast_components=True`` to pin the
    hint; ``False`` pins the shuffle path (both rewrites shuffle on the
    same key family, so AQE reuses the exchange where possible). A plan
    test (tests/test_components.py::test_canonicalize_no_forced_broadcast)
    asserts a large components frame plans as an equi-join, not
    BroadcastHashJoin, when the threshold rules it out.
    """
    subj = components.select(
        F.col("node").alias("subject_id"), F.col("component").alias("subject_canonical")
    )
    obj = components.select(
        F.col("node").alias("object_id"), F.col("component").alias("object_canonical")
    )
    if broadcast_components is True:
        subj, obj = F.broadcast(subj), F.broadcast(obj)
    elif broadcast_components is False:
        subj = subj.hint("shuffle_hash")
        obj = obj.hint("shuffle_hash")
    return (
        mappings.join(subj, on="subject_id", how="left")
        .join(obj, on="object_id", how="left")
        .withColumn("subject_canonical", F.coalesce("subject_canonical", F.col("subject_id")))
        .withColumn("object_canonical", F.coalesce("object_canonical", F.col("object_id")))
    )
