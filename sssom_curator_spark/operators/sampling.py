"""Deterministic hash-based sampling and train/val/test split assignment.

Not present in the reference (a curated-mapping repository has no notion
of corpus splits); these are the bread-and-butter selection operators of
a training-data pipeline, where ``df.sample()`` is the WRONG tool: its
output depends on partitioning and Spark's per-partition RNG stream, so
a re-run (or a recovered job) samples a different corpus. Everything
here keys on a salted md5 of the row's id — pure map-side codegen, no
shuffle, no state — so membership is a property of the ROW, stable
across re-runs, partitionings, cluster sizes, and engines (the DuckDB
oracle replays it with plain ``substr(md5(...))``).

Mechanism: the first 8 hex chars of ``md5(salt || '|' || id)`` are a
uniform 32-bit key; comparisons happen LEXICOGRAPHICALLY on fixed-width
lowercase hex (equal to numeric order), against thresholds precomputed
in Python as 8-hex-char literals — no base conversion on either engine.
Disjoint salts give independent selections; the same salt gives nested
ones (``fraction=0.1`` ⊂ ``fraction=0.2``), which is exactly the
reproducible-subset semantics scaling-law experiments need.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hex_threshold", "unit_hex", "split_assign", "deterministic_sample"]


def hex_threshold(fraction: float) -> str:
    """``fraction`` of the 32-bit key space as an 8-hex-char literal —
    the comparison constant both Spark and the SQL oracle embed."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return format(min(int(fraction * (1 << 32)), (1 << 32) - 1), "08x")


def unit_hex(col: Column | str, *, salt: str) -> Column:
    """Salted uniform 32-bit key as fixed-width lowercase hex."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.md5(F.concat_ws("|", F.lit(salt), c.cast("string"))), 1, 8)


def split_assign(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hashed-id bucket.

    ``weights`` maps split name → relative weight (normalized; default
    ``{"train": 0.9, "val": 0.05, "test": 0.05}``). Assignment is a
    chained threshold compare on the salted key — one map-side
    projection; a row's split never changes under re-runs or
    repartitioning, and documents deduplicated upstream can't leak
    across splits by id.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    if len(weights) < 2:
        raise ValueError("need at least two splits")
    total = float(sum(weights.values()))
    key = unit_hex(id_col, salt=salt)
    names = list(weights)
    expr = None
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name] / total
        cond = key < F.lit(hex_threshold(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = expr.otherwise(F.lit(names[-1]))
    return df.withColumn(out_col, expr)


def deterministic_sample(
    df: DataFrame, fraction: float, *, id_col: str = "doc_id", salt: str = "sample"
) -> DataFrame:
    """Keep a stable ``fraction`` of rows by hashed id. Nested under a
    shared salt: the 10% sample is a subset of the 20% sample. One
    map-side filter — at 100 TB this prunes before any downstream
    shuffle, and a resumed job selects the identical subset."""
    return df.filter(unit_hex(id_col, salt=salt) < F.lit(hex_threshold(fraction)))
