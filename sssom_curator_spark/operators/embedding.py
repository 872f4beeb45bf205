"""Embedding cosine-similarity join (SURVEY.md J4) and vector helpers.

The reference computes a block-nested-loop cosine similarity between a
source and a target embedding matrix in 10k-row target batches with a 0.65
cutoff (predict/embedding.py:53-57,106-161), asserting batched == unbatched
(tests/test_lexical.py:83-119 — the partition-invariance property a Spark
engine must hold by construction).

Spark-first design: the *target* matrix (ontology-sized, small) is
broadcast as a numpy array; the *source* side streams through an
iterator-of-batches pandas UDF that does one vectorized matmul per Arrow
batch (the Arrow batch IS the reference's "batch"), applies the cutoff
inside the UDF (Catalyst cannot push predicates into UDFs — SURVEY.md §4),
and emits candidate arrays that ``explode`` JVM-side. Partition-invariance
holds because each source row's scores depend only on that row and the
broadcast matrix.

For target sides too large to broadcast, ``cosine_topk_exact`` in
:mod:`sssom_curator_spark.operators.similarity` provides the shuffle-based
path; approximate variants live there too.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["embedding_similarity_join", "l2_normalize"]


def l2_normalize(col) -> "F.Column":
    """JVM-side L2 normalization of an array<float/double> column.

    ``aggregate`` + ``transform`` keep it inside codegen; zero vectors pass
    through unchanged (norm clamped to 1).
    """
    c = F.col(col) if isinstance(col, str) else col
    arr = F.transform(c, lambda x: x.cast("double"))
    norm = F.sqrt(
        F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    safe = F.when(norm > 0, norm).otherwise(F.lit(1.0))
    return F.transform(arr, lambda x: x / safe)


def embedding_similarity_join(
    source: DataFrame,
    target: DataFrame,
    *,
    id_col: str = "id",
    vec_col: str = "embedding",
    cutoff: float = 0.65,
    top_k: int | None = None,
) -> DataFrame:
    """All source×target cosine pairs with similarity ≥ ``cutoff``.

    Output: ``(source_id, target_id, cosine)``, cosine rounded to 3 places
    (reference rounds confidence — predict/lexical.py:253).

    The target matrix is collected and broadcast once (reference semantics:
    the target is one ontology's embedding table); each Arrow batch of the
    source does a single ``(batch × dim) @ (dim × n_target)`` matmul. With
    ``top_k`` set, only each source row's k best hits above the cutoff
    survive — the building block of the brute-force ANN baseline.
    """
    spark = source.sparkSession
    # Guardrail: the collect below is correct-by-design only while the
    # target is dimension-sized (an ontology's embedding table). A
    # corpus-sized target would OOM the *driver* — fail fast with a
    # pointer at the scale path instead. The check is folded into the
    # collect itself (take(limit+1) of the projection we need anyway), so
    # it costs ZERO extra Spark jobs.
    limit = int(
        spark.conf.get("spark.sssom.embedding.maxBroadcastTargetRows", "2000000")
    )
    rows = target.select(id_col, vec_col).take(limit + 1)
    if len(rows) > limit:
        raise ValueError(
            f"embedding_similarity_join target exceeds {limit} rows; it is "
            "collected to the driver and broadcast. For corpus-sized targets "
            "use operators.similarity.cosine_topk_lsh (bucketed, never n²) "
            "or cosine_topk_exact. Raise "
            "spark.sssom.embedding.maxBroadcastTargetRows to override."
        )
    t_ids = np.array([r[id_col] for r in rows], dtype=object)
    t_mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    if len(rows):
        norms = np.linalg.norm(t_mat, axis=1)
        norms[norms == 0] = 1.0
        t_mat = (t_mat.T / norms).T
    bc = spark.sparkContext.broadcast((t_ids, t_mat))

    out_schema = T.StructType(
        [
            T.StructField("source_id", T.StringType()),
            T.StructField("target_id", T.StringType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat = bc.value
        # targets pre-sorted by id so that within one source row, equal
        # scores order by target id — the stable mergesort below then
        # yields a deterministic top-k without per-row Python
        id_order = np.argsort(ids.astype(str), kind="stable")
        ids_sorted = ids[id_order]
        mat_sorted = mat[id_order] if mat.size else mat
        for batch in batches:
            if mat.size == 0 or batch.empty:
                yield pd.DataFrame({"source_id": [], "target_id": [], "cosine": []})
                continue
            s_mat = np.array(batch[vec_col].tolist(), dtype=np.float64)
            s_norms = np.linalg.norm(s_mat, axis=1)
            s_norms[s_norms == 0] = 1.0
            s_mat = (s_mat.T / s_norms).T
            sims = s_mat @ mat_sorted.T  # (batch, n_target)
            if top_k is not None and top_k < sims.shape[1]:
                # whole-matrix stable top-k: argsort -score per row (ties
                # fall back to column order = target id asc), keep k cols
                top_cols = np.argsort(-sims, axis=1, kind="stable")[:, :top_k]
                rows = np.repeat(np.arange(sims.shape[0]), top_k)
                cols = top_cols.ravel()
                keep = sims[rows, cols] >= cutoff
                rows, cols = rows[keep], cols[keep]
            else:
                rows, cols = np.nonzero(sims >= cutoff)
            src_ids = batch[id_col].astype(str).to_numpy()
            yield pd.DataFrame(
                {
                    "source_id": src_ids[rows],
                    "target_id": ids_sorted[cols].astype(str),
                    "cosine": np.round(sims[rows, cols], 3),
                }
            )

    return source.select(id_col, vec_col).mapInPandas(compute, schema=out_schema)
