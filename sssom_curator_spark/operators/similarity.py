"""Similarity search over embedding columns: exact top-k + LSH scale path.

Complements :mod:`sssom_curator_spark.operators.embedding` (the reference's
J4 broadcast cosine join). Two regimes:

- ``cosine_topk_exact``: brute-force cosine top-k. Pure column algebra
  (``zip_with`` dot product inside codegen) when both sides join-able, or
  the broadcast-matmul pandas UDF from ``embedding_similarity_join`` when
  the corpus side is broadcastable. The JVM variant is the DuckDB-oracle
  baseline.
- ``cosine_topk_lsh``: random-hyperplane LSH — deterministic planes seeded
  from md5, signature = sign-bit string, candidates share a band prefix,
  rerank candidates exactly. At 100 TB the bucket join shuffles only
  (corpus × bands) rows and never materializes the n² pair space.
"""

from __future__ import annotations

import hashlib

import numpy as np

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cosine_sim_col", "cosine_topk_exact", "cosine_topk_lsh", "cosine_near_duplicates"]


def cosine_sim_col(a: Column, b: Column, *, decimals: int = 4) -> Column:
    """JVM-side cosine similarity of two array<numeric> columns.

    ``zip_with`` + ``aggregate`` keep the whole expression in codegen —
    no Python. Rounded for cross-engine comparability.
    """
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(da, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(db, F.lit(0.0), lambda s, x: s + x * x))
    denom = na * nb
    sim = F.when(denom > 0, dot / denom).otherwise(F.lit(0.0))
    return F.round(sim, decimals)


def cosine_topk_exact(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 10,
    id_col: str = "id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: query × corpus join, windowed rank.

    Output ``(query_id, neighbor_id, cosine, rank)``; ties broken by
    neighbor id for full determinism. The crossJoin is explicit and
    intentional (the exact baseline); the LSH variant is the scale path.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_sim_col(F.col("_qv"), F.col("_cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplanes(dim: int, n_planes: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes: component (p, d) from
    md5(p|d) mapped to [-1, 1]. No RNG state, identical on every executor."""
    planes = np.empty((n_planes, dim))
    for p in range(n_planes):
        for d in range(dim):
            h = int(hashlib.md5(f"{p}|{d}".encode()).hexdigest()[:8], 16)
            planes[p, d] = (h / 0x7FFFFFFF) - 1.0
    return planes


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    k: int = 10,
    id_col: str = "id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH bucketing.

    Signature = ``n_planes`` sign bits, split into ``bands`` prefixes; a
    corpus row is a candidate for a query iff they share any band value.
    Candidates rerank with the exact JVM cosine. Recall is tunable via
    (n_planes, bands); the shuffle is per-band bucket-sized.
    """
    dim = len(queries.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes)
    rows_per_band = n_planes // bands

    def sig_cols(df: DataFrame, out: str) -> DataFrame:
        vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
        bits = []
        for p in range(n_planes):
            dot = F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(float(v)) for v in planes[p]]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda s, x: s + x,
            )
            bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
        bandcols = [
            F.struct(
                F.lit(b).alias("band"),
                F.concat(*bits[b * rows_per_band : (b + 1) * rows_per_band]).alias("key"),
            )
            for b in range(bands)
        ]
        return df.select(
            F.col(id_col), F.col(vec_col), F.explode(F.array(*bandcols)).alias(out)
        )

    qs = sig_cols(queries, "qb").select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col("qb.band").alias("band"),
        F.col("qb.key").alias("key"),
    )
    cs = sig_cols(corpus, "cb").select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.col("cb.band").alias("band"),
        F.col("cb.key").alias("key"),
    )
    cand = (
        qs.join(cs, on=["band", "key"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "_qv", "_cv")
        .distinct()
    )
    scored = cand.select(
        "query_id", "neighbor_id", cosine_sim_col(F.col("_qv"), F.col("_cv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_near_duplicates(
    df: DataFrame,
    *,
    id_col: str = "id",
    vec_col: str = "embedding",
    cutoff: float = 0.9,
    n_planes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: ``(doc_a, doc_b, cosine)``
    with ``doc_a < doc_b`` and cosine ≥ ``cutoff`` — the embedding member
    of the dedup family (exact/MinHash/SimHash/Jaccard siblings in
    :mod:`sssom_curator_spark.operators.dedup`).

    Candidates come from the same md5-seeded random-hyperplane banding as
    :func:`cosine_topk_lsh` (self-join on (band, key) — per-bucket sized,
    never n²); candidates rerank with the exact JVM cosine and the cutoff
    applies to the exact score. Recall is tunable via (n_planes, bands);
    near-duplicates (cosine → 1) collide in every band by construction.
    """
    dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes)
    rows_per_band = n_planes // bands

    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bits = []
    for p in range(n_planes):
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(v)) for v in planes[p]]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    bandcols = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat(*bits[b * rows_per_band : (b + 1) * rows_per_band]).alias("key"),
        )
        for b in range(bands)
    ]
    banded = df.select(
        F.col(id_col), F.col(vec_col), F.explode(F.array(*bandcols)).alias("bk")
    ).select(
        F.col(id_col), F.col(vec_col), F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.key") == F.col("r.key"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("doc_a"),
            F.col(f"r.{id_col}").alias("doc_b"),
            F.col(f"l.{vec_col}").alias("_va"),
            F.col(f"r.{vec_col}").alias("_vb"),
        )
        .distinct()
    )
    return (
        cand.select(
            "doc_a", "doc_b", cosine_sim_col(F.col("_va"), F.col("_vb")).alias("cosine")
        )
        .filter(F.col("cosine") >= cutoff)
    )
