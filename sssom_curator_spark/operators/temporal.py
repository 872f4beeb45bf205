"""Temporal joins: the as-of join Spark lacks as a built-in.

An as-of join attaches to every left row the LATEST right row with
``right_ts <= left_ts`` for the same key — the canonical event-to-
slowly-changing-dimension lookup (price as of trade time, profile as of
event time). Named by the task brief as a custom operator to express
Spark-first; no reference counterpart (the reference has no temporal
data).

Implementation is the scalable UNION + WINDOW idiom, not a per-key UDF
and not a range cross-join: both sides are tagged and unioned on the
key, one window pass ordered by ``(ts, side)`` carries each right
payload forward with ``last(ignorenulls)``, and left rows are filtered
back out. ONE shuffle total (the window's key partition); right rows
with equal ``(key, ts)`` are pre-collapsed to a deterministic
struct-max winner so the result never depends on partitioning. The
DuckDB oracle replays it with the engine's native ``ASOF JOIN``.

Skew note: the window partitions by the join key, so one pathological
key (a single user producing a large share of all events) serializes on
one reducer. The standard mitigation — splitting hot keys into time
ranges and carrying the last value across range boundaries — composes
on top of this operator; at the corpus design point keys are
users/entities whose per-key cardinality is bounded by human behavior,
not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join", "hypertable_rollup", "cohort_retention", "funnel_conversion", "rate_anomaly"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """All left columns plus every non-key right payload column (NULL
    when no right row is at-or-before the left timestamp). Right payload
    columns must not collide with left column names — rename upstream.
    """
    key = on
    rpay = [c for c in right.columns if c not in (key, right_ts)]
    collide = set(rpay) & set(left.columns)
    if collide:
        raise ValueError(f"right payload columns collide with left: {sorted(collide)}")

    # asof semantics never match NULLs (right_ts <= left_ts is UNKNOWN,
    # and the key equi-condition fails on NULL) — drop unmatched right
    # rows up front so a NULL-ts row can't sort first in the window and
    # leak its payload; DuckDB's native ASOF JOIN (the oracle) agrees.
    right = right.filter(F.col(key).isNotNull() & F.col(right_ts).isNotNull())
    # collapse equal-(key, ts) right rows to one deterministic winner:
    # the struct max compares payload fields in order
    r_uniq = right.groupBy(key, F.col(right_ts).alias("_ts")).agg(
        F.max(F.struct(*rpay)).alias("_p")
    )

    lpay = [c for c in left.columns if c != key]
    l_side = left.select(
        key,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*lpay).alias("_l"),
        F.lit(None).cast(r_uniq.schema["_p"].dataType).alias("_p"),
    )
    r_side = r_uniq.select(
        key,
        "_ts",
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_side.schema["_l"].dataType).alias("_l"),
        "_p",
    )
    # right rows at the same ts sort BEFORE left rows (asof is <=)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_side.unionByName(r_side).withColumn(
        "_pc",
        # a NULL left key or ts can never asof-match anything
        F.when(
            F.col(key).isNotNull() & F.col("_ts").isNotNull(),
            F.last("_p", ignorenulls=True).over(w),
        ),
    )
    out = carried.filter(F.col("_is_left") == 1).select(
        key,
        *[F.col(f"_l.{c}").alias(c) for c in lpay],
        *[F.col(f"_pc.{c}").alias(c) for c in rpay],
    )
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Range (interval-containment) join — the second temporal join the
    brief names as missing from Spark: every point row pairs with every
    interval row satisfying ``start <= point < end`` (inner semantics; a
    point inside k intervals emits k rows).

    Naively this is a non-equi join — Spark plans it as
    BroadcastNestedLoop or a cartesian product, the classic scale trap.
    The bucketized idiom instead: each interval EXPLODES onto the coarse
    grid cells it overlaps (``floor(start/w) .. floor(end/w)``), points
    map to their one cell, the join becomes an EQUI-join on the cell id,
    and an exact containment filter prunes grid false positives. One
    shuffle keyed on the cell; the explode factor is ``span/width + 1``
    per interval — pick ``bucket_width`` near the typical interval span
    so it stays O(1). A cell crowded with intervals is a genuine hot key;
    AQE's skew split handles it, and narrowing the grid bounds it.

    Columns: result = all point columns + all interval columns; names
    must not collide (rename upstream — same contract as
    :func:`asof_join`).
    """
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")
    collide = set(points.columns) & set(intervals.columns)
    if collide:
        raise ValueError(f"column collision between sides: {sorted(collide)}")
    p = F.col(point_col)
    s, e = F.col(start_col), F.col(end_col)
    w = F.lit(bucket_width)
    iexp = intervals.withColumn(
        "_cell", F.explode(F.sequence(F.floor(s / w), F.floor(e / w)))
    )
    return (
        points.withColumn("_cell", F.floor(p / w))
        .join(iexp, on="_cell")
        .filter((p >= s) & (p < e))
        .drop("_cell")
    )


def hypertable_rollup(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    levels: tuple[str, ...] = ("hour", "day", "week"),
) -> DataFrame:
    """Continuous-aggregate rollup (TimescaleDB-hypertable style, named in
    the brief): one frame holding ``(level, bucket_start, key, n, sum)``
    for every granularity in ``levels``, where each COARSER level is
    computed from the FINER level's partial aggregates, never from the
    raw events.

    That cascade is the scale property: raw events are scanned exactly
    ONCE (the finest level); a week row aggregates ~168 hour rows instead
    of millions of events, so refresh cost at 100 TB is proportional to
    the finest-level cardinality (keys × hours — a dimension, not a
    corpus). Counts and sums re-aggregate losslessly; the value sum is
    kept as a micro-quantized integer (``round(value * 1e6)`` per event)
    so the cascaded re-summation is exact integer arithmetic — float
    partial sums would drift between cascade orders and engines.

    ``levels`` must go finest → coarsest, drawn from ``date_trunc``
    units.
    """
    if not levels:
        raise ValueError("need at least one level")
    finest = levels[0]
    # each level is eagerly materialized (localCheckpoint): the final
    # union references every level, and lazy branches would re-derive the
    # cascade from raw events once PER LEVEL (unshared plan trees — the
    # same blowup as chained Column refs). Levels are dimension-sized
    # (keys x buckets), so the checkpoint is bounded; the raw corpus is
    # genuinely scanned once (plan-pinned: zero raw scans in the union).
    base = (
        events.groupBy(
            F.date_trunc(finest, F.col(ts_col)).alias("bucket_start"),
            F.col(key_col).alias("key"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            # floor(x + 0.5): nearest-quantization as pure double
            # arithmetic — decimal round() differs between engines on
            # half-boundaries (Spark HALF_UP vs shortest-repr rounding)
            F.sum(F.floor(F.col(value_col) * 1e6 + 0.5).cast("long")).alias(
                "sum_micro"
            ),
        )
        .localCheckpoint()
    )
    out = base.select(F.lit(finest).alias("level"), "*")
    finer = base
    for lvl in levels[1:]:
        finer = (
            finer.groupBy(
                F.date_trunc(lvl, F.col("bucket_start")).alias("bucket_start"),
                "key",
            )
            .agg(F.sum("n").alias("n"), F.sum("sum_micro").alias("sum_micro"))
            .localCheckpoint()
        )
        out = out.unionByName(finer.select(F.lit(lvl).alias("level"), "*"))
    return out


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention — the engagement matrix behind crawl-user
    and curation-activity dashboards: users are cohorted by the ISO week
    of their FIRST event; for every (cohort, week offset) the distinct
    active users, the cohort size, and the retention rate.

    Output: ``(cohort_week:string, week_offset:long, n_users, cohort_size,
    retention)``; offset 0 is the cohort's own week (retention 1.0 by
    construction). Week arithmetic is pure epoch math over
    ``date_trunc('week')`` stamps (Monday-aligned in Spark AND DuckDB,
    exact under the session's UTC clock) — no calendar UDFs.

    Scale shape: the first-event aggregation and the activity join share
    the user key (one shuffle, exchange reused); the distinct
    (cohort, offset, user) plans as the hub-safe two-shuffle expand, so
    a giant cohort cannot hot-key a reducer; the final count and the
    cohort-size dimension join are cohort-sized.
    """
    first = events.groupBy(F.col(user_col).alias("_u")).agg(
        F.min(ts_col).alias("_first")
    )
    cohort = F.date_trunc("week", F.col("_first"))
    week = F.date_trunc("week", F.col(ts_col))
    rows = events.join(first, on=F.col(user_col) == F.col("_u")).select(
        F.date_format(cohort, "yyyy-MM-dd").alias("cohort_week"),
        ((F.unix_timestamp(week) - F.unix_timestamp(cohort)) / F.lit(604800))
        .cast("long")
        .alias("week_offset"),
        F.col(user_col).alias("_user"),
    )
    act = rows.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("_user").alias("n_users")
    )
    sizes = first.groupBy(
        F.date_format(F.date_trunc("week", F.col("_first")), "yyyy-MM-dd").alias(
            "cohort_week"
        )
    ).agg(F.count(F.lit(1)).alias("cohort_size"))
    from sssom_curator_spark.operators.textstats import stable_round

    return act.join(sizes, on="cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_users",
        "cohort_size",
        stable_round(F.col("n_users") / F.col("cohort_size"), 6).alias("retention"),
    )


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel analysis: how many users completed each prefix of
    ``steps`` IN ORDER (each step strictly after the user's earliest
    completion of the previous one — the standard greedy matching, which
    is optimal for existence: if any ordered assignment exists, the
    earliest-completion chain exists). Output one row per step:
    ``(step_index, step, n_users, conversion)`` with ``conversion``
    relative to step 1 (6 dp; step 1 is 1.0 unless the funnel is empty).

    Scale shape: one user-keyed min aggregation per step, each feeding
    the next through a user-keyed equi-join — every exchange shares the
    user key (Spark reuses the partitioning), and the per-step frames
    shrink monotonically. The per-step counts ride in ONE collected
    k-row frame; no per-user data ever reaches the driver.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    spark = events.sparkSession
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("_u"))
        .agg(F.min(ts_col).alias("_t"))
        .localCheckpoint()
    )
    counts = [cur.count()]
    for step in steps[1:]:
        nxt = (
            events.filter(F.col(type_col) == step)
            .select(F.col(user_col).alias("_u"), F.col(ts_col).alias("_ts"))
            .join(cur, on="_u")
            .filter(F.col("_ts") > F.col("_t"))
            .groupBy("_u")
            .agg(F.min("_ts").alias("_t"))
            .localCheckpoint()
        )
        counts.append(nxt.count())
        cur = nxt
    base = counts[0]
    import pandas as pd

    from sssom_curator_spark.operators.textstats import ROUND_EPS

    pdf = pd.DataFrame(
        {
            "step_index": range(1, len(steps) + 1),
            "step": steps,
            "n_users": counts,
            "conversion": [
                round(c / base + ROUND_EPS, 6) if base else 0.0 for c in counts
            ],
        }
    )
    return spark.createDataFrame(
        pdf, "step_index long, step string, n_users long, conversion double"
    )


def rate_anomaly(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    type_col: str = "event_type",
    bucket: str = "hour",
    z_threshold: float | None = None,
) -> DataFrame:
    """Event-rate burst detection: per (type, time bucket) counts z-scored
    against the type's OWN bucket distribution — the monitoring query
    that flags crawler storms, bot bursts, and pipeline stalls (a stall
    is a negative burst). Output: ``(event_type, bucket_ts:string, n, z)``
    for every observed bucket, z rounded to 6 dp and NULL for types whose
    rate never varies (zero variance); ``z_threshold`` keeps only rows
    with ``|z| >= threshold`` when set.

    Scale shape: one (type, bucket)-keyed count with map-side partials —
    the only corpus-sized stage; moments aggregate the BUCKET frame per
    type (population σ via sqrt(E[n²]−E[n]²), FP-clamped) and join back
    type-keyed, dimension-sized throughout.
    """
    b = F.date_format(F.date_trunc(bucket, F.col(ts_col)), "yyyy-MM-dd HH:mm:ss")
    counts = events.groupBy(
        F.col(type_col).alias("event_type"), b.alias("bucket_ts")
    ).agg(F.count(F.lit(1)).alias("n"))
    moments = counts.groupBy("event_type").agg(
        F.avg("n").alias("_mu"),
        F.sqrt(
            F.greatest(
                F.avg(F.col("n") * F.col("n")) - F.avg("n") * F.avg("n"),
                F.lit(0.0),
            )
        ).alias("_sigma"),
    )
    from sssom_curator_spark.operators.textstats import stable_round

    out = counts.join(moments, on="event_type").select(
        "event_type",
        "bucket_ts",
        "n",
        F.when(
            F.col("_sigma") > 0,
            stable_round((F.col("n") - F.col("_mu")) / F.col("_sigma"), 6),
        ).alias("z"),
    )
    if z_threshold is not None:
        out = out.filter(F.abs(F.col("z")) >= z_threshold)
    return out
