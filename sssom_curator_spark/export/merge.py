"""Merge export (SURVEY.md S6/U1/U5/C5): union → standardize → subset map →
canonical TSV.

Reference lifecycle (export/merge.py:24-158): union the four files in file
order, bioregistry-standardize prefixes (``chebi`` → ``CHEBI``,
tests/test_merge.py:109-133), subset the prefix map to used prefixes, and
write a sorted TSV with metadata header. Here the union/standardize/
used-prefix steps are DataFrame algebra; only the tiny prefix map and the
single-file serialization touch the driver.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sssom_curator_spark.functions.curie_ops import curie_prefix, standardize_curie
from sssom_curator_spark.io.sssom_tsv import write_sssom_tsv
from sssom_curator_spark.operators.relational import merge_repository

__all__ = ["standardize_frame", "used_prefixes", "merge_to_tsv"]


def standardize_frame(df: DataFrame, alias_map: dict[str, str]) -> DataFrame:
    """C5 over all CURIE-carrying columns."""
    out = df
    for col in ("subject_id", "object_id", "predicate_id"):
        out = out.withColumn(col, standardize_curie(col, alias_map))
    out = out.withColumn(
        "author_id", F.transform("author_id", lambda x: x)  # authors are ORCIDs: already canonical
    )
    return out


def used_prefixes(df: DataFrame) -> list[str]:
    """U5 (export/merge.py:155-156): distinct prefixes actually referenced."""
    rows = (
        df.select(
            F.explode(
                F.array(
                    curie_prefix("subject_id"),
                    curie_prefix("object_id"),
                    curie_prefix("predicate_id"),
                    curie_prefix("mapping_justification"),
                    curie_prefix("mapping_tool_id"),
                )
            ).alias("p")
        )
        .union(df.select(F.explode(F.coalesce("author_id", F.array())).alias("a")).select(curie_prefix("a")))
        .union(df.select(F.explode(F.coalesce("reviewer_id", F.array())).alias("r")).select(curie_prefix("r")))
        .filter(F.col("p").isNotNull() & (F.col("p") != ""))
        .distinct()
        .collect()
    )
    return sorted(r["p"] for r in rows)


def merge_to_tsv(
    frames: dict[str, DataFrame],
    path: str,
    *,
    prefix_map: dict[str, str],
    alias_map: dict[str, str] | None = None,
    metadata: dict[str, Any] | None = None,
) -> list[str]:
    """Full merge export. Returns serialized columns."""
    merged = merge_repository(frames).drop("status")
    if alias_map:
        merged = standardize_frame(merged, alias_map)
    used = set(used_prefixes(merged))
    sub_map = {p: u for p, u in prefix_map.items() if p in used}
    return write_sssom_tsv(
        merged,
        path,
        prefix_map=sub_map,
        metadata=metadata,
        sort=True,
        drop_duplicates=True,
    )
