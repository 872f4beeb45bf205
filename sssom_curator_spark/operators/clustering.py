"""Deterministic k-means over embedding columns — the corpus-organization
primitive (topic bucketing for mixture weighting, diversity-aware
sampling, per-cluster quality audits) that complements the ANN family in
:mod:`sssom_curator_spark.operators.similarity`.

No reference counterpart (the reference has no embedding operators); the
IVF index in ``similarity.py:282`` is the one-iteration special case of
this operator and shares its design vocabulary.

Algorithm: spherical k-means (cosine assignment, elementwise-mean
update), fully deterministic and SQL-replayable:

- seeds are the ``k`` vectors with the smallest ids — no RNG, so a rerun
  (or the DuckDB oracle) reproduces the exact trajectory;
- assignment scores are rounded to 6 decimals before the argmax and ties
  break to the lowest cluster id, so engine float-summation-order
  differences cannot flip near-tied cells (same discipline as
  ``cosine_topk_ivf``);
- updated centroid components are rounded to 9 decimals (with the shared
  ``ROUND_EPS`` half-boundary shift), making the iteration-N centroids
  bit-identical across engines before iteration N+1 reads them;
- a cluster that loses all members simply drops out (its centroid is the
  mean of an empty set); later assignments use the surviving centroids.

Scale shape: the centroid state is ``k × dim`` doubles — collected and
broadcast once per iteration, never shuffled. Assignment is an
embarrassingly parallel Arrow-batched matmul against the broadcast
matrix (one scan, zero shuffles). The update is a posexplode +
aggregate whose map-side partial reduction collapses every partition to
at most ``k × dim`` rows before the one tiny shuffle. The input is
deliberately NOT cached across iterations: at the 100 TB design point a
corpus-sized cache is a liability (VERDICT r04), and a parquet re-scan
per iteration is the cheaper, spill-free plan; callers who know their
input is small may persist it themselves before calling.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sssom_curator_spark.operators.textstats import ROUND_EPS

__all__ = ["kmeans_assignments"]


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return (mat.T / norms).T


def kmeans_assignments(
    df: DataFrame,
    *,
    k: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``n_iter`` Lloyd iterations from the min-id seeds and return the
    final assignment: ``(id_col, cluster, score)`` where ``cluster`` is
    the seed index (0-based over the id-ordered seeds) and ``score`` the
    cosine to the winning centroid rounded to 4 decimals.
    """
    spark = df.sparkSession
    seed_rows = df.select(id_col, vec_col).orderBy(F.col(id_col)).limit(k).collect()
    if not seed_rows:
        id_type = dict(zip(df.schema.names, df.schema.fields))[id_col].dataType
        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField(id_col, id_type),
                    T.StructField("cluster", T.LongType()),
                    T.StructField("score", T.DoubleType()),
                ]
            ),
        )

    cluster_ids = list(range(len(seed_rows)))
    cent_mat = np.array([r[vec_col] for r in seed_rows], dtype=np.float64)

    out_schema = T.StructType(
        [
            T.StructField("cluster", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def _assign_frame(centroids: tuple[list[int], np.ndarray]) -> DataFrame:
        bc = spark.sparkContext.broadcast(centroids)

        @F.pandas_udf(out_schema)
        def assign(vs: pd.Series) -> pd.DataFrame:
            if vs.empty:
                return pd.DataFrame({"cluster": [], "score": []})
            ids, mat = bc.value
            v = _normalize(np.array(vs.tolist(), dtype=np.float64))
            raw = v @ _normalize(mat).T  # (batch, n_clusters)
            # argmax over 6-dp-rounded scores; np.argmax takes the FIRST
            # max and columns are ordered by cluster id ascending, so
            # ties break to the lowest cluster id — SQL-replayable
            best = np.argmax(np.round(raw, 6), axis=1)
            rows = np.arange(len(best))
            return pd.DataFrame(
                {
                    "cluster": np.array(ids, dtype=np.int64)[best],
                    "score": np.round(raw[rows, best], 4),
                }
            )

        a = F.col("_a")
        return df.select(id_col, vec_col).withColumn(
            "_a", assign(F.col(vec_col))
        ).select(id_col, vec_col, a["cluster"].alias("cluster"), a["score"].alias("score"))

    for _ in range(n_iter):
        assigned = _assign_frame((cluster_ids, cent_mat))
        cent_rows = (
            assigned.select("cluster", F.posexplode(F.col(vec_col)).alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("val") + F.lit(ROUND_EPS), 9).alias("v"))
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in cent_rows:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["v"]
        cluster_ids = sorted(by_cluster)
        cent_mat = np.array(
            [
                [by_cluster[c][p] for p in sorted(by_cluster[c])]
                for c in cluster_ids
            ],
            dtype=np.float64,
        )

    return _assign_frame((cluster_ids, cent_mat)).select(id_col, "cluster", "score")
