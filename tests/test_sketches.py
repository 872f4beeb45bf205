"""k-mins distinct sketch (operators/sketches.py)."""

from __future__ import annotations
import pytest


class TestKminsDistinct:
    def test_estimate_within_error_and_partition_invariant(self, spark):
        from pyspark.sql import functions as F

        from sssom_curator_spark.operators.sketches import kmins_distinct

        # group 'a': 400 distinct values, each twice; 'b': 50 distinct
        df = spark.range(0, 800).select(
            F.lit("a").alias("g"), (F.col("id") % 400).alias("v")
        ).unionByName(
            spark.range(0, 50).select(F.lit("b").alias("g"), F.col("id").alias("v"))
        )
        rows = {r["g"]: r for r in
                kmins_distinct(df, group_col="g", value_col="v", num_mins=32).collect()}
        assert rows["a"]["n_rows"] == 800 and rows["b"]["n_rows"] == 50
        for g, exact in (("a", 400), ("b", 50)):
            est = rows[g]["distinct_est_micro"] / 1e6
            # ~1/sqrt(32) ≈ 18% std error; allow 3 sigma
            assert abs(est - exact) / exact < 0.6, (g, est, exact)
        again = {r["g"]: r["distinct_est_micro"] for r in
                 kmins_distinct(df.repartition(13), group_col="g", value_col="v",
                                num_mins=32).collect()}
        assert again == {g: rows[g]["distinct_est_micro"] for g in rows}

    def test_merge_by_min_equals_union_sketch(self, spark):
        """The mergeability contract: elementwise-min of two shard
        sketches equals the sketch of the union."""
        from pyspark.sql import functions as F

        from sssom_curator_spark.operators.sketches import kmins_distinct

        full = spark.range(0, 300).select(F.lit("g").alias("g"), F.col("id").alias("v"))
        s1 = full.filter(F.col("v") < 150)
        s2 = full.filter(F.col("v") >= 100)  # overlapping shards

        def raw_mins(df):
            v = F.col("v").cast("string")
            srcs = [F.md5(F.concat_ws("|", F.lit(str(j)), v)) for j in range(4)]
            aggs = [F.min(F.substring(srcs[i // 4], 1 + 8 * (i % 4), 8)).alias(f"m_{i}")
                    for i in range(16)]
            return df.groupBy("g").agg(*aggs).collect()[0]

        a, b, u = raw_mins(s1), raw_mins(s2), raw_mins(full)
        merged = tuple(min(a[f"m_{i}"], b[f"m_{i}"]) for i in range(16))
        assert merged == tuple(u[f"m_{i}"] for i in range(16))

    def test_plan_is_one_aggregate_exchange(self, spark):
        from pyspark.sql import functions as F

        from sssom_curator_spark.operators.sketches import kmins_distinct

        df = spark.range(0, 100).select(F.lit("g").alias("g"), F.col("id").alias("v"))
        plan = (
            kmins_distinct(df, group_col="g", value_col="v")
            ._jdf.queryExecution().executedPlan().toString()
        )
        exchanges = [l for l in plan.splitlines() if "Exchange hashpartitioning" in l]
        assert len(exchanges) == 1  # map-side partial mins, one shuffle
        assert "Window" not in plan  # no per-group sort anywhere


class TestExactQuantiles:
    def test_matches_python_oracle(self, spark):
        import math

        import pandas as pd

        from sssom_curator_spark.operators.sketches import exact_quantiles

        vals = [1, 1, 2, 3, 3, 3, 7, 10, 10, 50] * 3
        df = spark.createDataFrame(pd.DataFrame({"x": vals + [None]}))
        # 0.1 * 30 = 3.0000000000000004 in doubles: the boundary case a
        # bare ceil() overshoots (rank 4 instead of 3)
        qs = [0.1, 0.25, 0.5, 0.9, 1.0]
        got = {r["q"]: r["value"] for r in exact_quantiles(df, "x", qs).collect()}

        s = sorted(vals)
        want = {q: s[math.ceil(q * len(s) - 1e-9) - 1] for q in qs}
        assert got == want
        assert got[1.0] == 50  # q=1 is the maximum

    def test_validation(self, spark):
        import pandas as pd

        from sssom_curator_spark.operators.sketches import exact_quantiles

        df = spark.createDataFrame(pd.DataFrame({"x": [1]}))
        with pytest.raises(ValueError):
            exact_quantiles(df, "x", [0.0, 0.5])
        with pytest.raises(ValueError):
            exact_quantiles(df, "x", [])
