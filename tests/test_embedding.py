"""Embedding similarity: partition/batch invariance (the reference's own
batched-vs-unbatched property, tests/test_lexical.py:83-119) + numpy oracle."""

from __future__ import annotations

import numpy as np

from sssom_curator_spark.operators.embedding import embedding_similarity_join
from sssom_curator_spark.operators.similarity import cosine_topk_exact, cosine_topk_lsh

# the reference's fixture matrices (tests/test_lexical.py:86-105)
LEFT = {
    "49E2512": [0.0, 0.0, 1.0],
    "48C3522": [0.0, 1.0, 0.0],
    "49G621": [1.0, 0.0, 0.0],
}
RIGHT = {
    "0000005": [0.0, 1.0, 1.0],
    "0000102": [1.0, 1.0, 0.0],
    "0000953": [1.0, 0.0, 1.0],
    "0001088": [1.0, 1.0, 1.0],
}


def _df(spark, data):
    return spark.createDataFrame(
        [(k, [float(x) for x in v]) for k, v in data.items()],
        "id string, embedding array<float>",
    )


def _numpy_oracle(cutoff):
    out = set()
    for lid, lv in LEFT.items():
        for rid, rv in RIGHT.items():
            a, b = np.array(lv), np.array(rv)
            sim = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            if sim >= cutoff:
                out.add((lid, rid, round(sim, 3)))
    return out


class TestSimilarityJoin:
    def test_matches_numpy_oracle_at_cutoffs(self, spark):
        for cutoff in (-1.0, 0.0, 0.5):
            got = {
                (r["source_id"], r["target_id"], r["cosine"])
                for r in embedding_similarity_join(
                    _df(spark, LEFT), _df(spark, RIGHT), cutoff=cutoff
                ).collect()
            }
            assert got == _numpy_oracle(cutoff), cutoff

    def test_batch_partition_invariance(self, spark):
        # reference asserts batched == unbatched; Spark equivalent: result
        # independent of source partitioning / Arrow batch size
        left = _df(spark, LEFT)
        a = embedding_similarity_join(left.coalesce(1), _df(spark, RIGHT), cutoff=-1)
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
        try:
            b = embedding_similarity_join(left.repartition(3), _df(spark, RIGHT), cutoff=-1)
            assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
        finally:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")

    def test_top_k(self, spark):
        got = embedding_similarity_join(
            _df(spark, LEFT), _df(spark, RIGHT), cutoff=-1, top_k=2
        )
        per_source = {}
        for r in got.collect():
            per_source.setdefault(r["source_id"], []).append(r)
        assert all(len(v) == 2 for v in per_source.values())


class TestTopK:
    def test_exact_topk_ranks(self, spark):
        emb = spark.createDataFrame(
            [(str(i), [float(i == j) for j in range(4)]) for i in range(4)]
            + [("q", [1.0, 0.1, 0.0, 0.0])],
            "id string, embedding array<float>",
        )
        got = cosine_topk_exact(emb.filter(emb["id"] == "q"), emb, k=2)
        rows = sorted(got.collect(), key=lambda r: r["rank"])
        assert rows[0]["neighbor_id"] == "0"
        assert rows[1]["neighbor_id"] == "1"

    def test_ivf_results_subset_of_exact_scores(self, spark):
        import random

        from sssom_curator_spark.operators.similarity import cosine_topk_ivf

        rng = random.Random(7)
        emb = spark.createDataFrame(
            [(str(i), [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)],
            "id string, embedding array<float>",
        )
        exact = {
            (r["query_id"], r["neighbor_id"]): r["cosine"]
            for r in cosine_topk_exact(emb.limit(5), emb, k=60).collect()
        }
        approx = cosine_topk_ivf(emb.limit(5), emb, k=5, n_centroids=8, n_probe=3).collect()
        assert approx  # finds something
        for r in approx:
            assert exact[(r["query_id"], r["neighbor_id"])] == r["cosine"]
        # pair uniqueness by construction (one cell per corpus row,
        # distinct probed cells per query — no dedup shuffle needed)
        pairs = [(r["query_id"], r["neighbor_id"]) for r in approx]
        assert len(pairs) == len(set(pairs))

    def test_ivf_partition_invariance(self, spark):
        # the reference's batched==unbatched property generalized: result
        # independent of input partitioning / Arrow batch size
        import random

        from sssom_curator_spark.operators.similarity import cosine_topk_ivf

        rng = random.Random(11)
        rows = [(str(i), [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
        emb = spark.createDataFrame(rows, "id string, embedding array<float>")
        a = sorted(
            map(tuple, cosine_topk_ivf(emb.limit(4), emb, k=3, n_centroids=4).collect())
        )
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
        try:
            b = sorted(
                map(
                    tuple,
                    cosine_topk_ivf(
                        emb.limit(4).repartition(7), emb.repartition(5), k=3, n_centroids=4
                    ).collect(),
                )
            )
        finally:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        assert a == b

    def test_ivf_empty_corpus(self, spark):
        from sssom_curator_spark.operators.similarity import cosine_topk_ivf

        empty = spark.createDataFrame([], "id string, embedding array<float>")
        q = spark.createDataFrame([("q", [1.0, 0.0])], "id string, embedding array<float>")
        assert cosine_topk_ivf(q, empty).collect() == []

    def test_lsh_results_subset_of_exact_scores(self, spark):
        import random

        rng = random.Random(3)
        emb = spark.createDataFrame(
            [(str(i), [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)],
            "id string, embedding array<float>",
        )
        exact = {
            (r["query_id"], r["neighbor_id"]): r["cosine"]
            for r in cosine_topk_exact(emb.limit(5), emb, k=60).collect()
        }
        approx = cosine_topk_lsh(emb.limit(5), emb, k=5).collect()
        assert approx  # finds something
        for r in approx:
            assert exact[(r["query_id"], r["neighbor_id"])] == r["cosine"]


class TestProductionDims:
    """The LSH family must stay plan-size O(1) in embedding width: the old
    implementation embedded the hyperplane matrix as n_planes×dim column
    literals (12k–65k expression nodes at 768–4096-d — analysis/codegen
    blowup); the Arrow-batched signature UDF keeps the matrix out of the
    plan entirely."""

    def test_lsh_plan_builds_fast_and_runs_at_768d(self, spark):
        import time

        from sssom_curator_spark.operators.similarity import (
            cosine_near_duplicates,
            cosine_topk_lsh,
        )

        dim = 768
        emb = spark.createDataFrame(
            [
                (str(i), [((i * 37 + j * 13) % 19 - 9) / 9.0 for j in range(dim)])
                for i in range(8)
            ]
            + [("dup7", [((7 * 37 + j * 13) % 19 - 9) / 9.0 for j in range(dim)])],
            "id string, embedding array<float>",
        )
        t0 = time.monotonic()
        topk = cosine_topk_lsh(emb.limit(3), emb, k=3)
        near = cosine_near_duplicates(emb, cutoff=0.99)
        # plan construction + analysis must be bounded — with literal planes
        # this took unbounded time/size in dim
        assert time.monotonic() - t0 < 10
        plan = topk._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert topk.count() > 0
        # the planted exact duplicate collides in every band and survives
        pairs = {(r["doc_a"], r["doc_b"]) for r in near.collect()}
        assert ("7", "dup7") in pairs

    def test_lsh_empty_and_null_inputs(self, spark):
        import pytest
        from pyspark.sql import functions as F

        from sssom_curator_spark.operators.similarity import cosine_near_duplicates

        empty = spark.createDataFrame([], "id string, embedding array<float>")
        assert cosine_near_duplicates(empty).collect() == []
        withnull = spark.createDataFrame(
            [("a", [1.0, 0.0]), ("b", None)], "id string, embedding array<float>"
        )
        with pytest.raises(Exception, match="null embedding"):
            cosine_near_duplicates(withnull).collect()


class TestBroadcastGuardrail:
    def test_oversized_target_raises(self, spark):
        import pytest

        from pyspark.sql import functions as F

        from sssom_curator_spark.operators.embedding import embedding_similarity_join

        big = spark.range(50).select(
            F.col("id").cast("string").alias("id"),
            F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
        )
        spark.conf.set("spark.sssom.embedding.maxBroadcastTargetRows", "10")
        try:
            with pytest.raises(ValueError, match="cosine_topk_lsh"):
                embedding_similarity_join(big.limit(5), big)
        finally:
            spark.conf.unset("spark.sssom.embedding.maxBroadcastTargetRows")


class TestHyperplanes:
    def test_hyperplane_seed_rule(self):
        """Batched construction must stay bit-identical to the original
        per-element md5 rule (the oracle replays signatures derived from
        these planes)."""
        import hashlib

        from sssom_curator_spark.operators.similarity import _hyperplanes

        dim, n = 17, 4
        got = _hyperplanes(dim, n)
        assert got.shape == (n, dim)
        for p in range(n):
            for d in range(dim):
                h = int(hashlib.md5(f"{p}|{d}".encode()).hexdigest()[:8], 16)
                assert got[p, d] == (h / 0x7FFFFFFF) - 1.0

    def test_cosine_neardup_single_signature_scan(self, spark):
        """The persisted banded frame must make the Arrow-batch signature
        matmul run exactly ONCE per corpus row even though the candidate
        self-join references it twice (VERDICT r03 'What's wrong #1')."""
        from pyspark.sql import functions as F

        from sssom_curator_spark.operators.similarity import cosine_near_duplicates

        rows = [
            (f"v{i}", [float(i % 3 == 0), float(i % 3 == 1), float(i % 3 == 2)])
            for i in range(9)
        ]
        df = spark.createDataFrame(rows, "id string, embedding array<float>")
        acc = spark.sparkContext.accumulator(0)
        out = cosine_near_duplicates(df, cutoff=0.99, _sig_counter=acc)
        pairs = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
        assert ("v0", "v3") in pairs  # identical vectors found
        assert acc.value == 9  # one signature per vector, not 2x


class TestCosineNearDupBucketScoring:
    """r06: per-bucket numpy scoring must stay pair-for-pair identical
    (ids AND rounded cosines) to the old join+rerank formulation."""

    def test_matches_join_rerank(self, spark):
        from pyspark.sql import functions as F

        from sssom_curator_spark.operators.similarity import (
            _banded,
            _rerank_pairs,
            cosine_near_duplicates,
        )

        rows = [
            (i, [((i * 31 + j * 7) % 23 - 11) / 11.0 for j in range(16)])
            for i in range(60)
        ] + [(1000 + i, [((i * 31 + j * 7) % 23 - 11) / 11.0 for j in range(16)]) for i in range(10)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        new = cosine_near_duplicates(emb, id_col="vec_id", cutoff=0.3)

        banded = _banded(
            emb, id_col="vec_id", vec_col="embedding",
            n_planes=16, bands=4, id_alias="_bid",
        ).persist()
        l, r = banded.alias("l"), banded.alias("r")
        cand = (
            l.join(
                r,
                on=[
                    F.col("l.band") == F.col("r.band"),
                    F.col("l.key") == F.col("r.key"),
                    F.col("l._bid") < F.col("r._bid"),
                ],
            )
            .select(F.col("l._bid").alias("doc_a"), F.col("r._bid").alias("doc_b"))
            .distinct()
        )
        old = _rerank_pairs(
            cand, emb, emb, left_key="doc_a", right_key="doc_b",
            id_col="vec_id", vec_col="embedding",
        ).filter(F.col("cosine") >= 0.3)
        got = sorted(map(tuple, new.collect()))
        want = sorted(map(tuple, old.collect()))
        banded.unpersist()
        assert got == want
        assert len(want) > 0  # the planted duplicates collide and pass
