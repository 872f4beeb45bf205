"""Per-partition lineage & metrics instrumentation (north rule: "every
stage writes per-partition lineage and metrics rows").

``instrument`` wraps any DataFrame in a ``mapInPandas`` pass-through that
counts rows and wall time per partition and reports them through Spark
accumulators — zero extra shuffles, zero extra actions; metrics materialize
as a side effect of whatever action the pipeline already runs.
``MetricsRegistry.frame`` turns the collected values into a METRICS_SCHEMA
DataFrame appendable to a metrics table (Iceberg in production, parquet
here).
"""

from __future__ import annotations

import time
from typing import Iterator

import pandas as pd

from pyspark import AccumulatorParam, TaskContext
from pyspark.sql import DataFrame, SparkSession

from sssom_curator_spark.schema import METRICS_SCHEMA

__all__ = ["MetricsRegistry"]


class _ListParam(AccumulatorParam):
    def zero(self, value):
        return []

    def addInPlace(self, a, b):
        a.extend(b)
        return a


class MetricsRegistry:
    """Holds one list-accumulator per instrumented stage."""

    def __init__(self, spark: SparkSession) -> None:
        self._spark = spark
        self._acc = spark.sparkContext.accumulator([], _ListParam())

    def instrument(self, df: DataFrame, stage: str) -> DataFrame:
        """Pass-through wrapper emitting (stage, partition, rows, wall_ms).

        rows_in == rows_out for a pass-through; stages that filter should
        instrument both their input and output frames under two names.
        """
        acc = self._acc
        schema = df.schema

        def trace(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            t0 = time.monotonic()
            rows = 0
            for batch in batches:
                rows += len(batch)
                yield batch
            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx is not None else -1
            acc.add([(stage, pid, rows, rows, (time.monotonic() - t0) * 1000.0)])

        return df.mapInPandas(trace, schema=schema)

    def frame(self) -> DataFrame:
        """Collected metrics as a DataFrame (empty until an action ran)."""
        rows = [
            {
                "stage": s,
                "partition_id": int(p),
                "rows_in": int(ri),
                "rows_out": int(ro),
                "wall_ms": float(w),
            }
            for (s, p, ri, ro, w) in self._acc.value
        ]
        return self._spark.createDataFrame(rows, METRICS_SCHEMA)

    def write(self, path: str) -> None:
        self.frame().write.mode("append").parquet(path)
