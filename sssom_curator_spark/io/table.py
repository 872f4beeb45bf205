"""Partitioned mapping-table sink/scan (north rule: emitted SSSOM triples
"materialized as partitioned Iceberg tables").

The container has no Iceberg runtime, so the table is a partitioned
parquet directory — the layout Iceberg would manage; the production swap
is ``df.writeTo(table).partitionedBy(...)`` and touches only this module
(same stance as :mod:`sssom_curator_spark.checkpoint`).

Partitioning is on DERIVED CURIE prefixes (``subject_prefix`` by
default): mapping consumers overwhelmingly slice by ontology namespace,
and a prefix partition column turns that slice into partition PRUNING at
the scan — no bytes read outside the requested namespace. The derived
column is written but dropped again on read, so the round trip preserves
the mapping schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sssom_curator_spark.functions.curie_ops import curie_prefix

__all__ = ["write_mappings_table", "read_mappings_table", "write_training_shards"]

#: partition column name → expression over the mapping row
_DERIVED = {
    "subject_prefix": lambda: curie_prefix("subject_id"),
    "object_prefix": lambda: curie_prefix("object_id"),
    "status_part": lambda: F.coalesce(F.col("status"), F.lit("unknown")),
}


def write_mappings_table(
    df: DataFrame,
    path: str,
    *,
    partition_by: tuple[str, ...] = ("subject_prefix",),
    mode: str = "overwrite",
) -> None:
    """Write the mapping frame as a partitioned table.

    ``partition_by`` names derived partition columns (``subject_prefix``,
    ``object_prefix``, ``status_part``) and/or existing columns. Derived
    columns are computed here; Spark's dynamic partition writer lays out
    one directory per value — a CC-scale mapping table has tens of
    prefixes, so the partition count stays sane (never partition on a
    high-cardinality key like record_id).
    """
    out = df
    for col in partition_by:
        if col in _DERIVED and col not in out.columns:
            out = out.withColumn(col, _DERIVED[col]())
    out.write.mode(mode).partitionBy(*partition_by).parquet(path)


def read_mappings_table(
    spark: SparkSession,
    path: str,
    *,
    subject_prefix: str | None = None,
) -> DataFrame:
    """Scan the partitioned table; a ``subject_prefix`` slice becomes a
    partition filter (check ``.explain``: PartitionFilters, not a
    post-scan Filter), so only that namespace's files are read."""
    df = spark.read.parquet(path)
    if subject_prefix is not None:
        df = df.filter(F.col("subject_prefix") == subject_prefix)
    drop = [c for c in _DERIVED if c in df.columns]
    return df.drop(*drop)


def write_training_shards(
    df: DataFrame,
    path: str,
    *,
    split_col: str = "split",
    id_col: str = "doc_id",
    rows_per_shard: int = 100_000,
    mode: str = "overwrite",
) -> None:
    """Materialize a training corpus as deterministic sharded parquet —
    the final sink of the selection pipeline (``split_assign`` →
    ``stratified_sample`` → ``pack_sequences`` → here): one directory per
    split, files of at most ``rows_per_shard`` rows, rows sorted by
    ``id_col`` within every file so a re-run writes byte-stable shards
    and a training loader streams ids in a reproducible order.

    Scale shape: ``repartitionByRange(split, id)`` gives the dynamic
    partition writer pre-clustered input — every task writes to exactly
    ONE split directory (no writer-side fan-out to every partition, the
    classic dynamic-partition small-files failure) and the range
    boundaries come from a sampled sketch, so shards stay balanced even
    when one split dominates. ``maxRecordsPerFile`` caps shard size
    without another shuffle. Sorting happens inside the range partitions
    (``sortWithinPartitions``), never globally.
    """
    n_parts = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    (
        df.repartitionByRange(n_parts, F.col(split_col), F.col(id_col))
        .sortWithinPartitions(split_col, id_col)
        .write.mode(mode)
        .option("maxRecordsPerFile", rows_per_shard)
        .partitionBy(split_col)
        .parquet(path)
    )
