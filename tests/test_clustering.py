"""Deterministic spherical k-means (operators/clustering.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from tests.test_functions import get_cached_spark

    return get_cached_spark()


def _vecs(n=60, dim=8, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randn(n, dim).astype(np.float32)


def _frame(spark, mat):
    return spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": range(len(mat)), "embedding": [list(map(float, v)) for v in mat]}
        )
    )


def _numpy_replay(mat, k, n_iter):
    """Mirror of the operator's exact trajectory (min-id seeds, 6-dp
    argmax with lowest-cluster ties, 9-dp rounded mean updates)."""

    def norm(m):
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = 1.0
        return (m.T / n).T

    x = mat.astype(np.float64)
    cent = x[:k].copy()
    ids = list(range(len(cent)))
    for _ in range(n_iter):
        scores = norm(x) @ norm(cent).T
        best = np.argmax(np.round(scores, 6), axis=1)
        nxt, nxt_ids = [], []
        for j, c in enumerate(ids):
            members = x[best == j]
            if len(members):
                nxt.append(np.round(members.mean(axis=0) + 1e-9, 9))
                nxt_ids.append(c)
        cent, ids = np.array(nxt), nxt_ids
    scores = norm(x) @ norm(cent).T
    best = np.argmax(np.round(scores, 6), axis=1)
    return {
        i: (ids[b], round(float(scores[i, b]), 4))
        for i, b in enumerate(best)
    }


class TestKmeans:
    def test_matches_numpy_replay(self, spark):
        from sssom_curator_spark.operators.clustering import kmeans_assignments

        mat = _vecs()
        got = {
            r["vec_id"]: (r["cluster"], r["score"])
            for r in kmeans_assignments(_frame(spark, mat), k=4, n_iter=2).collect()
        }
        want = _numpy_replay(mat, k=4, n_iter=2)
        assert got == want

    def test_partition_invariant(self, spark):
        from sssom_curator_spark.operators.clustering import kmeans_assignments

        df = _frame(spark, _vecs())
        a = sorted(map(tuple, kmeans_assignments(df, k=4, n_iter=1).collect()))
        b = sorted(
            map(tuple, kmeans_assignments(df.repartition(7), k=4, n_iter=1).collect())
        )
        assert a == b

    def test_k_exceeds_n_and_empty(self, spark):
        from sssom_curator_spark.operators.clustering import kmeans_assignments

        small = _frame(spark, _vecs(n=3))
        out = kmeans_assignments(small, k=8, n_iter=1).collect()
        assert len(out) == 3 and {r["cluster"] for r in out} <= {0, 1, 2}

        empty = kmeans_assignments(small.filter(F.lit(False)), k=4)
        assert empty.count() == 0
        assert empty.columns == ["vec_id", "cluster", "score"]

    def test_iterations_tighten_clusters(self, spark):
        """Mean assignment score must not get worse as Lloyd iterates
        (on this fixture; k-means monotonicity holds per-objective)."""
        from sssom_curator_spark.operators.clustering import kmeans_assignments

        df = _frame(spark, _vecs(n=120))
        m0 = kmeans_assignments(df, k=4, n_iter=0).agg(F.avg("score")).first()[0]
        m3 = kmeans_assignments(df, k=4, n_iter=3).agg(F.avg("score")).first()[0]
        assert m3 >= m0
