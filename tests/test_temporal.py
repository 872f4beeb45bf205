"""As-of join (operators/temporal.py)."""

from __future__ import annotations

import pytest


class TestAsofJoin:
    def _frames(self, spark):
        from pyspark.sql import functions as F

        left = spark.createDataFrame(
            [
                (1, "2024-01-01 00:10:00", "e1"),
                (1, "2024-01-01 00:30:00", "e2"),
                (2, "2024-01-01 00:05:00", "e3"),
            ],
            "user_id int, ts_s string, event_id string",
        ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "event_id")
        right = spark.createDataFrame(
            [
                (1, "2024-01-01 00:00:00", 10.0),
                (1, "2024-01-01 00:30:00", 20.0),  # equal to e2's ts -> picked (<=)
                (2, "2024-01-01 00:06:00", 99.0),  # after e3 -> e3 gets NULL
            ],
            "user_id int, ts_s string, v double",
        ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "v")
        return left, right

    def test_hand_case(self, spark):
        from sssom_curator_spark.operators.temporal import asof_join

        left, right = self._frames(spark)
        got = {r["event_id"]: r["v"] for r in asof_join(left, right, on="user_id").collect()}
        assert got == {"e1": 10.0, "e2": 20.0, "e3": None}

    def test_equal_ts_right_rows_pick_struct_max(self, spark):
        from pyspark.sql import functions as F

        from sssom_curator_spark.operators.temporal import asof_join

        left, _ = self._frames(spark)
        right = spark.createDataFrame(
            [(1, "2024-01-01 00:00:00", 5.0), (1, "2024-01-01 00:00:00", 7.0)],
            "user_id int, ts_s string, v double",
        ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "v")
        out = asof_join(left, right, on="user_id")
        got = {r["event_id"]: r["v"] for r in out.collect()}
        assert got["e1"] == 7.0  # deterministic max, not partition luck
        again = {
            r["event_id"]: r["v"]
            for r in asof_join(left.repartition(5), right.repartition(3),
                               on="user_id").collect()
        }
        assert again == got

    def test_collision_raises(self, spark):
        from pyspark.sql import functions as F

        from sssom_curator_spark.operators.temporal import asof_join

        left, right = self._frames(spark)
        with pytest.raises(ValueError, match="collide"):
            asof_join(left, right.withColumnRenamed("v", "event_id"), on="user_id")

    def test_one_shuffle_plan(self, spark):
        """Pin the scale shape: exactly ONE hash exchange (the window's
        key partition) — no join exchanges, no cross product."""
        from sssom_curator_spark.operators.temporal import asof_join

        left, right = self._frames(spark)
        plan = (
            asof_join(left, right, on="user_id")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
        exchanges = [
            l for l in plan.splitlines() if "Exchange hashpartitioning" in l
        ]
        # window exchange + the right-side pre-dedup aggregate exchange
        assert len(exchanges) <= 2


class TestRangeJoin:
    def _frames(self, spark):
        points = spark.createDataFrame(
            [("p1", 5), ("p2", 10), ("p3", 25), ("p4", 99)],
            "pid string, t long",
        )
        intervals = spark.createDataFrame(
            [("i1", 0, 10), ("i2", 5, 30), ("i3", 90, 95)],
            "iid string, s long, e long",
        )
        return points, intervals

    def test_containment_and_multiplicity(self, spark):
        from sssom_curator_spark.operators.temporal import range_join

        points, intervals = self._frames(spark)
        got = sorted(
            (r["pid"], r["iid"])
            for r in range_join(
                points, intervals, point_col="t", start_col="s", end_col="e",
                bucket_width=8,
            ).collect()
        )
        # p1(5): i1 [0,10) + i2 [5,30); p2(10): i2 only (end exclusive);
        # p3(25): i2; p4(99): nothing (i3 ends at 95)
        assert got == [("p1", "i1"), ("p1", "i2"), ("p2", "i2"), ("p3", "i2")]

    def test_no_bnlj_in_plan(self, spark):
        from sssom_curator_spark.operators.temporal import range_join

        points, intervals = self._frames(spark)
        plan = (
            range_join(points, intervals, point_col="t", start_col="s",
                       end_col="e", bucket_width=8)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastNestedLoop" not in plan
        assert "CartesianProduct" not in plan

    def test_bad_width_and_collision(self, spark):
        from pyspark.sql import functions as F

        from sssom_curator_spark.operators.temporal import range_join

        points, intervals = self._frames(spark)
        with pytest.raises(ValueError, match="positive"):
            range_join(points, intervals, point_col="t", start_col="s",
                       end_col="e", bucket_width=0)
        with pytest.raises(ValueError, match="collision"):
            range_join(points, intervals.withColumnRenamed("iid", "pid"),
                       point_col="t", start_col="s", end_col="e", bucket_width=8)


class TestHypertableRollup:
    def test_cascade_matches_direct_and_scans_once(self, spark):
        from pyspark.sql import functions as F

        from sssom_curator_spark.operators.temporal import hypertable_rollup

        ev = spark.createDataFrame(
            [
                ("a", "2024-01-01 00:10:00", 1.5),
                ("a", "2024-01-01 00:40:00", 2.5),
                ("a", "2024-01-01 05:00:00", 1.0),
                ("b", "2024-01-02 00:00:00", 4.25),
            ],
            "event_type string, ts_s string, value double",
        ).select("event_type", F.to_timestamp("ts_s").alias("ts"), "value")
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            ev.write.mode("overwrite").parquet(f"{d}/ev")
            ev = spark.read.parquet(f"{d}/ev")
            out = hypertable_rollup(ev, levels=("hour", "day"))
            out.count()  # materialize while the temp files exist
            rows = {
                (r["level"], str(r["bucket_start"]), r["key"]): (r["n"], r["sum_micro"])
                for r in out.collect()
            }
            assert rows[("hour", "2024-01-01 00:00:00", "a")] == (2, 4_000_000)
            assert rows[("day", "2024-01-01 00:00:00", "a")] == (3, 5_000_000)
            assert rows[("day", "2024-01-02 00:00:00", "b")] == (1, 4_250_000)
            # the scale property: levels are checkpointed partials — the
            # raw parquet source appears ZERO times in the union's plan
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert plan.count("Scan parquet") == 0

    def test_empty_levels_raises(self, spark):
        from sssom_curator_spark.operators.temporal import hypertable_rollup

        with pytest.raises(ValueError):
            hypertable_rollup(spark.range(1).selectExpr(
                "timestamp('2024-01-01') ts", "'a' event_type", "1.0 value"
            ), levels=())


class TestAsofNullSemantics:
    def test_null_ts_and_key_never_match(self, spark):
        from pyspark.sql import functions as F

        from sssom_curator_spark.operators.temporal import asof_join

        left = spark.createDataFrame(
            [(1, "2024-01-01 01:00:00", "e1"), (None, "2024-01-01 01:00:00", "e2")],
            "user_id int, ts_s string, event_id string",
        ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "event_id")
        right = spark.createDataFrame(
            [(1, None, 5.0), (None, "2024-01-01 00:00:00", 7.0)],
            "user_id int, ts_s string, v double",
        ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "v")
        got = {r["event_id"]: r["v"] for r in asof_join(left, right, on="user_id").collect()}
        # NULL-ts right row must not leak its payload; NULL-key left row
        # must not pick up the NULL-key right row (DuckDB ASOF agrees)
        assert got == {"e1": None, "e2": None}


class TestCohortRetention:
    def test_matches_python_oracle(self, spark):
        import datetime as dt

        import pandas as pd

        from sssom_curator_spark.operators.temporal import cohort_retention

        base = dt.datetime(2024, 1, 1)  # a Monday
        rows = [
            # user 1: first week 0, active weeks 0, 1, 3
            (1, base), (1, base + dt.timedelta(days=8)), (1, base + dt.timedelta(days=22)),
            # user 2: same cohort, only week 0 (two events dedupe)
            (2, base + dt.timedelta(days=2)), (2, base + dt.timedelta(days=3)),
            # user 3: cohort week 1, active weeks 1 and 2
            (3, base + dt.timedelta(days=7)), (3, base + dt.timedelta(days=15)),
        ]
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["user_id", "ts"])
        )
        got = {
            (r["cohort_week"], r["week_offset"]): (
                r["n_users"], r["cohort_size"], r["retention"],
            )
            for r in cohort_retention(df).collect()
        }
        assert got == {
            ("2024-01-01", 0): (2, 2, 1.0),
            ("2024-01-01", 1): (1, 2, 0.5),
            ("2024-01-01", 3): (1, 2, 0.5),
            ("2024-01-08", 0): (1, 1, 1.0),
            ("2024-01-08", 1): (1, 1, 1.0),
        }


class TestFunnelConversion:
    def test_ordered_matching(self, spark):
        import datetime as dt

        import pandas as pd

        from sssom_curator_spark.operators.temporal import funnel_conversion

        t0 = dt.datetime(2024, 1, 1)

        def ev(u, typ, minutes):
            return (u, typ, t0 + dt.timedelta(minutes=minutes))

        rows = [
            # u1 completes all three in order
            ev(1, "view", 0), ev(1, "click", 5), ev(1, "purchase", 10),
            # u2 clicks BEFORE viewing: click must not count
            ev(2, "click", 0), ev(2, "view", 5),
            # u3 views then clicks, never purchases
            ev(3, "view", 0), ev(3, "click", 1),
            # u4 purchase only: not even step 1
            ev(4, "purchase", 0),
        ]
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
        )
        got = {
            r["step"]: (r["step_index"], r["n_users"], r["conversion"])
            for r in funnel_conversion(df, ["view", "click", "purchase"]).collect()
        }
        assert got == {
            "view": (1, 3, 1.0),
            "click": (2, 2, round(2 / 3 + 1e-9, 6)),
            "purchase": (3, 1, round(1 / 3 + 1e-9, 6)),
        }

    def test_empty_funnel(self, spark):
        import pandas as pd

        from sssom_curator_spark.operators.temporal import funnel_conversion

        df = spark.createDataFrame(
            pd.DataFrame({"user_id": [1], "event_type": ["x"], "ts": [None]})
        )
        got = funnel_conversion(df, ["view", "click"]).collect()
        assert [(r["n_users"], r["conversion"]) for r in got] == [(0, 0.0), (0, 0.0)]


class TestRateAnomaly:
    def test_burst_detected(self, spark):
        import datetime as dt
        import math

        import pandas as pd

        from sssom_curator_spark.operators.temporal import rate_anomaly

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        # steady: 2 clicks per hour for 5 hours; burst: 20 in hour 5
        for h in range(5):
            rows += [("click", t0 + dt.timedelta(hours=h, minutes=m)) for m in (5, 35)]
        rows += [("click", t0 + dt.timedelta(hours=5, minutes=m)) for m in range(20)]
        # constant type: zero variance -> NULL z
        rows += [("view", t0 + dt.timedelta(hours=h)) for h in range(3)]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["event_type", "ts"]))

        got = {
            (r["event_type"], r["bucket_ts"]): (r["n"], r["z"])
            for r in rate_anomaly(df).collect()
        }
        ns = [2] * 5 + [20]
        mu = sum(ns) / 6
        sigma = math.sqrt(sum(n * n for n in ns) / 6 - mu * mu)
        z_burst = round((20 - mu) / sigma + 1e-9, 6)
        assert got[("click", "2024-01-01 05:00:00")] == (20, z_burst)
        assert got[("view", "2024-01-01 00:00:00")] == (1, None)

        flagged = rate_anomaly(df, z_threshold=2.0).collect()
        assert {(r["event_type"], r["bucket_ts"]) for r in flagged} == {
            ("click", "2024-01-01 05:00:00")
        }
