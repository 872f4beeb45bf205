"""Connected components vs a driver-side union-find oracle."""

from __future__ import annotations

import random
from collections import defaultdict

from sssom_curator_spark.graph.components import canonicalize_mappings, connected_components
from sssom_curator_spark.sources.fixtures import seed_repository


def _union_find_oracle(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    comp = defaultdict(set)
    for a, b in edges:
        for n in (a, b):
            comp[find(n)].add(n)
    out = {}
    for members in comp.values():
        rep = min(members)
        for n in members:
            out[n] = rep
    return out


class TestConnectedComponents:
    def test_mixed_topologies(self, spark):
        edges = [
            ("a", "b"), ("b", "c"), ("c", "d"),       # chain
            ("x", "y"),                                  # pair
            ("h", "s1"), ("h", "s2"), ("h", "s3"),    # star
            ("p", "q"), ("q", "r"), ("r", "p"),       # cycle
        ]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r["node"]: r["component"] for r in connected_components(df).collect()}
        assert got == _union_find_oracle(edges)

    def test_random_graph_matches_union_find(self, spark):
        rng = random.Random(11)
        edges = [(f"n{rng.randrange(250)}", f"n{rng.randrange(250)}") for _ in range(300)]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "src string, dst string")
        # force the distributed large-star/small-star path
        got = {
            r["node"]: r["component"]
            for r in connected_components(df, small_graph_threshold=0).collect()
        }
        assert got == _union_find_oracle(edges)
        # fast path must agree exactly
        fast = {r["node"]: r["component"] for r in connected_components(df).collect()}
        assert fast == got

    def test_partition_invariance(self, spark):
        rng = random.Random(5)
        edges = [(f"n{rng.randrange(100)}", f"n{rng.randrange(100)}") for _ in range(150)]
        edges = [(a, b) for a, b in edges if a != b]
        one = spark.createDataFrame(edges, "src string, dst string").coalesce(1)
        many = spark.createDataFrame(edges, "src string, dst string").repartition(16)
        a = sorted(map(tuple, connected_components(one).collect()))
        b = sorted(map(tuple, connected_components(many).collect()))
        assert a == b

    def test_long_chain_converges(self, spark):
        # O(log n) rounds must close a 200-node path within max_iterations
        edges = [(f"c{i:03d}", f"c{i + 1:03d}") for i in range(200)]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {
            r["component"]
            for r in connected_components(df, small_graph_threshold=0).collect()
        }
        assert got == {"c000"}


class TestCanonicalization:
    def test_mappings_rewrite_to_representative(self, spark):
        repo = seed_repository(spark)
        comps = spark.createDataFrame(
            [("CHEBI:11986", "CHEBI:11986"), ("mesh:C048271", "CHEBI:11986")],
            "node string, component string",
        )
        out = canonicalize_mappings(repo, comps)
        row = out.filter(out["subject_id"] == "CHEBI:11986").first()
        assert row["subject_canonical"] == "CHEBI:11986"
        assert row["object_canonical"] == "CHEBI:11986"
        # unmapped CURIEs pass through
        other = out.filter(out["subject_id"] == "CHEBI:10057").first()
        assert other["subject_canonical"] == "CHEBI:10057"


class TestCanonicalizeScaleSafety:
    def test_canonicalize_no_forced_broadcast(self, spark):
        """At the 10^12-node design point the components frame is corpus-
        derived and cannot broadcast; with the broadcast threshold ruling
        it out, the rewrite must plan as a shuffled equi-join — no
        BroadcastHashJoin / BroadcastNestedLoopJoin anywhere."""
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            comps = spark.range(1000).select(
                F.concat(F.lit("N:"), F.col("id")).alias("node"),
                F.concat(F.lit("N:"), (F.col("id") / 10).cast("long")).alias("component"),
            )
            maps = spark.range(1000).select(
                F.concat(F.lit("N:"), F.col("id")).alias("subject_id"),
                F.lit("skos:exactMatch").alias("predicate_id"),
                F.concat(F.lit("N:"), (F.col("id") + 1)).alias("object_id"),
            )
            plan = canonicalize_mappings(maps, comps)._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin" not in plan
            assert "BroadcastNestedLoopJoin" not in plan
            assert "Join" in plan
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    def test_forced_modes_agree(self, spark):
        """broadcast_components True/False/None all produce identical rows."""
        from pyspark.sql import functions as F

        comps = spark.createDataFrame(
            [("a:1", "a:1"), ("b:1", "a:1")], "node string, component string"
        )
        maps = spark.createDataFrame(
            [("b:1", "skos:exactMatch", "c:9")],
            "subject_id string, predicate_id string, object_id string",
        )
        outs = [
            sorted(
                canonicalize_mappings(maps, comps, broadcast_components=mode)
                .select("subject_canonical", "object_canonical")
                .collect()
            )
            for mode in (None, True, False)
        ]
        assert outs[0] == outs[1] == outs[2]
        assert outs[0][0]["subject_canonical"] == "a:1"
        assert outs[0][0]["object_canonical"] == "c:9"
