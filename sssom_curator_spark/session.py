"""SparkSession factory with scale-appropriate defaults.

Single place where engine-level configuration lives so tests, bench and the
driver entrypoint all agree. The settings are chosen for the 100 TB design
point (AQE with skew-join splitting, partition coalescing, Arrow batching)
while remaining correct on ``local[k]``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "ENGINE_CONFIGS"]

#: Configuration applied to every session this engine creates.
#:
#: - AQE: runtime re-planning — coalesces post-shuffle partitions, converts
#:   sort-merge joins to broadcast when the build side turns out small, and
#:   splits skewed shuffle partitions (hub ontology labels, hot URLs).
#: - Arrow: all pandas-UDF traffic is Arrow-batched; 10k rows/batch mirrors
#:   the reference's block-nested-loop batch size
#:   (/root/reference/src/sssom_curator/predict/embedding.py:56-57).
#: - Session timezone pinned to UTC so timestamp semantics match the DuckDB
#:   oracle and are cluster-independent.
ENGINE_CONFIGS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.shuffle.partitions": "32",
    # Parquet scans: vectorized reader + pushdown are on by default; pin
    # them so a misconfigured cluster can't silently regress.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    # Keep broadcast autodetection on; dimension tables (prefix maps,
    # lexical indices, id->name) are broadcast explicitly regardless.
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.sql.ui.explainMode": "formatted",
    # Local-mode hygiene: the default 1g driver heap OOMs once dozens of
    # AQE query executions + checkpoint blocks accumulate; the UI retains
    # per-execution plan trees we never look at in headless runs.
    # NOTE: spark.driver.memory here only takes effect under spark-submit;
    # for builder-launched local JVMs get_spark() sets PYSPARK_SUBMIT_ARGS
    # (measured: without it the JVM came up with a 2 GB heap regardless).
    "spark.driver.memory": "8g",
    "spark.ui.enabled": "false",
    "spark.sql.ui.retainedExecutions": "16",
    "spark.cleaner.periodicGC.interval": "10min",
    # Spark's generated whole-stage-codegen methods routinely exceed the
    # JIT's 8 KB bytecode limit and would otherwise run INTERPRETED
    # forever (measured: first-run 42-130 s and 2-4x steady-state swings
    # on the KG pipeline; with the flag, 21 s first run and stable ~11 s
    # steady state at local[32]).
    "spark.driver.extraJavaOptions": "-XX:-DontCompileHugeMethods",
    "spark.executor.extraJavaOptions": "-XX:-DontCompileHugeMethods",
}


def get_spark(
    app_name: str = "sssom-curator-spark",
    master: str | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (falling back to
    ``local[*]``) so the same code runs under the driver harness, pytest and
    ``spark-submit`` (where ``master`` is supplied externally and must be
    left ``None``).
    """
    # Driver heap for builder-launched local JVMs: spark.driver.memory in
    # the builder conf is NOT honored once the py4j gateway spawns the JVM
    # (it came up with a 2 GB heap in testing); it must travel through
    # PYSPARK_SUBMIT_ARGS before the first launch. No-op under
    # spark-submit (the env var is already set) or if a JVM exists.
    if "PYSPARK_SUBMIT_ARGS" not in os.environ:
        mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        os.environ["PYSPARK_SUBMIT_ARGS"] = f"--driver-memory {mem} pyspark-shell"
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is not None:
        builder = builder.master(master)
    for key, value in ENGINE_CONFIGS.items():
        builder = builder.config(key, value)
    for key, value in (extra or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
