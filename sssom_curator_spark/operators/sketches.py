"""Distinct-count sketching (the brief's "novel sketch" slot).

``kmins_distinct`` is a k-mins cardinality sketch (Flajolet/Martin
lineage; the KMV/bottom-k family's aggregate-only sibling): per group,
keep the MINIMUM of ``k`` independent uniform hashes of the value; with
``D`` distinct values each minimum has expectation ``1/(D+1)``, so
``D ≈ k / Σ min_i − 1``.

Why this shape and not ``approx_count_distinct`` (HLL++) or bottom-k:

- every per-group state is k MINIMA — a plain aggregate with MAP-SIDE
  combine, so a group with a billion rows costs its reducer
  O(partitions), never a window sort (bottom-k needs a per-group top-k,
  which serializes a hot group);
- minima are order- and duplicate-insensitive, and the k sums happen
  over a FIXED column order — the estimate is bit-deterministic across
  partitionings, re-runs, and engines, so unlike HLL++ the DuckDB
  oracle replays it EXACTLY (hash family = the same md5-slice
  construction as the MinHash signatures, lexicographic-ordered
  fixed-width hex);
- sketches MERGE by elementwise min — a rollup of per-shard sketches
  equals the sketch of the union, the property a 1000-executor
  aggregation tree needs.

Standard error is ~1/√k (k=16 → ~25%; raise ``num_mins`` in multiples
of 4 for tighter bounds — each md5 yields four independent 32-bit
slices).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["kmins_distinct", "exact_quantiles"]

#: 2^32 — the hash-slice value space
_SPACE = 4294967296.0


def kmins_distinct(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str,
    num_mins: int = 16,
) -> DataFrame:
    """Per-group distinct-count estimate: ``(group_col, n_rows,
    distinct_est_micro)`` with the estimate floor-quantized to integer
    micro-units (exact cross-engine — floor of identical IEEE doubles).

    One aggregate, one shuffle, k string minima of map-side-combined
    state per group. The +1-denominator guard keeps a group whose every
    hash is minimal (tiny D) finite.
    """
    v = F.col(value_col).cast("string")
    srcs = [
        F.md5(F.concat_ws("|", F.lit(str(j)), v))
        for j in range((num_mins + 3) // 4)
    ]
    aggs = [
        F.min(F.substring(srcs[i // 4], 1 + 8 * (i % 4), 8)).alias(f"m_{i}")
        for i in range(num_mins)
    ]
    g = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_rows"), *aggs)
    # fixed-order sum of the k normalized minima (hex -> long -> [0,1);
    # +1 in the numerator space keeps min=0 slices finite)
    msum = None
    for i in range(num_mins):
        term = (F.conv(F.col(f"m_{i}"), 16, 10).cast("long") + 1) / F.lit(_SPACE)
        msum = term if msum is None else msum + term
    est = F.lit(float(num_mins)) / msum - 1.0
    return g.select(
        group_col,
        "n_rows",
        F.floor(est * 1e6).cast("long").alias("distinct_est_micro"),
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: list[float],
) -> DataFrame:
    """EXACT discrete quantiles of a bounded-cardinality metric column —
    the threshold calculator behind corpus quality cuts ("drop the
    bottom 5% by token count", "cap at p99 length"), where
    ``percentile_approx``'s error bars move the cut line between runs.

    Semantics (replayed verbatim by the DuckDB oracle): for each q, the
    smallest value whose cumulative count reaches ``ceil(q · N)`` —
    discrete lower-interpolation over non-NULL values. Output:
    ``(q, value)``.

    Scale contract: the plan aggregates the corpus to a VALUE HISTOGRAM
    first (one shuffle on the value key, map-side partial counts), so
    everything after the first exchange is sized by the metric's
    CARDINALITY, not the corpus — exact quantiles of integer metrics
    (token counts, byte lengths, scores in fixed decimals) are cheap at
    any corpus size. The cumulative window DOES order the histogram on a
    single reducer: that is histogram-sized by design; for genuinely
    continuous unbounded columns use ``percentile_approx`` instead (this
    operator would degenerate to a global sort).
    """
    from pyspark.sql import Window

    if not quantiles or not all(0.0 < q <= 1.0 for q in quantiles):
        raise ValueError(f"quantiles must be in (0, 1], got {quantiles}")
    hist = (
        df.select(F.col(value_col).alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select("v", F.sum("c").over(w).alias("cum"))
    total = hist.agg(F.sum("c").cast("double").alias("total"))
    qs = df.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(float(q)) for q in quantiles])).alias("q")
    )
    # ceil over an EPSILON-NUDGED product: q·N is irrational-in-binary for
    # most q (0.07 · 100 = 7.000000000000001 in doubles) and a bare ceil
    # overshoots the documented rank by one at exact rational boundaries —
    # the one failure mode an "exact" quantile operator must not have. The
    # nudge (1e-9 ≪ 1 count) can never cross a true integer boundary for
    # N < 2^30-ish corpora of distinct ranks; the DuckDB oracle and the
    # unit-test oracle apply the identical expression.
    return (
        qs.crossJoin(F.broadcast(total))
        .join(
            cum,
            on=F.col("cum") >= F.ceil(F.col("q") * F.col("total") - F.lit(1e-9)),
        )
        .groupBy("q")
        .agg(F.min("v").alias("value"))
    )
