"""SSSOM TSV scan and lint-on-write sink (SURVEY.md S1/S3/S4, F9, O1, U2).

The reference reads/writes row-oriented TSV with a ``#``-prefixed YAML
metadata header carrying the CURIE prefix map and mapping-set metadata, and
its writer is a *linter*: canonical sort, drop-duplicates, exclusion of
curated mappings, dynamic column pruning (only non-empty columns serialize)
— /root/reference/tests/test_merge.py:87-105,
/root/reference/src/sssom_curator/constants.py:100-109,
/root/reference/src/sssom_curator/web/backends/memory.py:138-153.

Spark-first disposition: TSV exists only at the fixture boundary (golden
files, interop). All heavy lifting — sort, dedup, exclusion anti-join,
non-empty-column detection — happens distributed on the DataFrame; only the
final single-file serialization touches the driver, mirroring the
reference's single-file artifact. At scale the sink is a partitioned
Parquet/Iceberg table (the :class:`sssom_curator_spark.checkpoint.
SnapshotStore` writes exactly that shape).
"""

from __future__ import annotations

import datetime
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sssom_curator_spark.schema import (
    CANONICAL_KEY_COLUMNS,
    CANONICAL_SORT_COLUMNS,
    MAPPING_SCHEMA,
    TSV_COLUMN_ORDER,
)

__all__ = [
    "parse_metadata_header",
    "read_sssom_tsv",
    "read_sssom_url",
    "chain_prefix_maps",
    "lint_frame",
    "write_sssom_tsv",
    "insert_sssom_tsv",
    "render_metadata_header",
]

_ARRAY_COLUMNS = {"author_id", "reviewer_id"}
_DATE_COLUMNS = {"mapping_date", "review_date"}
_DOUBLE_COLUMNS = {"confidence", "reviewer_agreement"}


def parse_metadata_header(path: str) -> tuple[dict[str, str], dict[str, Any]]:
    """Parse the ``#``-prefixed YAML header of an SSSOM TSV.

    Returns ``(prefix_map, metadata)``. Driver-side by design: the header is
    a few dozen lines regardless of data scale (the reference's 43.4M-row
    SeMRA file still has a tiny header — repository.py:987-997).
    """
    prefix_map: dict[str, str] = {}
    metadata: dict[str, Any] = {}
    in_curie_map = False
    with open(path, encoding="utf-8") as handle:
        for line in handle:
            if not line.startswith("#"):
                break
            body = line[1:].rstrip("\n")
            if body.strip() == "curie_map:":
                in_curie_map = True
                continue
            if in_curie_map and body.startswith("  "):
                key, _, value = body.strip().partition(":")
                prefix_map[key.strip()] = value.strip()
                continue
            in_curie_map = False
            key, _, value = body.partition(":")
            metadata[key.strip()] = value.strip().strip("'\"")
    return prefix_map, metadata


def read_sssom_tsv(
    spark: SparkSession, path: str
) -> tuple[DataFrame, dict[str, str], dict[str, Any]]:
    """SSSOM TSV scan (S1): header-metadata parse + schema normalization.

    The data portion is read distributed (``spark.read.csv`` skips ``#``
    comment lines executor-side, so a multi-GB TSV never touches the
    driver); dynamic columns are normalized into the fixed
    :data:`MAPPING_SCHEMA` — missing columns become typed nulls, multi-value
    author/reviewer cells split on ``|``.
    """
    prefix_map, metadata = parse_metadata_header(path)
    raw = (
        spark.read.option("sep", "\t")
        .option("header", True)
        .option("comment", "#")
        .option("nullValue", "")
        .csv(path)
    )
    present = set(raw.columns)
    projections = []
    for field in MAPPING_SCHEMA.fields:
        name = field.name
        if name not in present:
            projections.append(F.lit(None).cast(field.dataType).alias(name))
        elif name in _ARRAY_COLUMNS:
            projections.append(F.split(F.col(name), r"\|").alias(name))
        else:
            projections.append(F.col(name).cast(field.dataType).alias(name))
    return raw.select(*projections), prefix_map, metadata


def read_sssom_url(
    spark: SparkSession, url: str
) -> tuple[DataFrame, dict[str, str], dict[str, Any]]:
    """SSSOM URL scan (S2): fetch + distribute + the S1 scan.

    The reference streams a remote TSV (43.4M-row SeMRA import) through a
    pystow download cache (repository.py:987-997). Here ``SparkContext.
    addFile`` performs the fetch once and exposes the file locally
    (``http(s)://``, ``ftp://`` and ``file://`` URLs all supported by the
    Spark file server); the scan then reuses :func:`read_sssom_tsv`.
    Cluster note: for multi-executor deployments land big imports on
    shared storage (S3/HDFS/Iceberg) and point ``read_sssom_tsv`` at it —
    addFile is the parity path for the reference's single-file import.
    """
    from urllib.parse import urlparse

    from pyspark import SparkFiles

    spark.sparkContext.addFile(url)
    # addFile registers under the basename of the URL *path* — query
    # strings / fragments (signed URLs) are not part of the name, so parse
    # properly instead of splitting the raw URL on '/'. Two URLs sharing a
    # basename collide within a session (addFile itself errors on the
    # second registration with different contents).
    name = os.path.basename(urlparse(url).path.rstrip("/"))
    return read_sssom_tsv(spark, SparkFiles.get(name))


def conform_to_mapping_schema(df: DataFrame) -> DataFrame:
    """Project any mapping-shaped frame onto the fixed
    :data:`MAPPING_SCHEMA`: missing columns become typed nulls, present
    columns cast to the canonical types. The unionByName building block
    behind :func:`insert_sssom_tsv`."""
    present = set(df.columns)
    projections = []
    for field in MAPPING_SCHEMA.fields:
        if field.name in present:
            projections.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            projections.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*projections)


def insert_sssom_tsv(
    spark: SparkSession,
    path: str,
    include_mappings: DataFrame,
    *,
    alias_map: dict[str, str] | None = None,
    exclude_columns: list[str] | None = None,
    sort: bool = True,
) -> list[str]:
    """S4 append-with-lint roundtrip — the reference's daily-driver
    ``insert()`` verb (constants.py:76-107): read the file, standardize the
    incoming mappings against its converter, append, and write back
    through the full lint stack (sort + drop_duplicates + dynamic columns
    + metadata header preserved).

    ``alias_map`` plays the converter's standardization role (C5) over the
    CURIE columns of the *incoming* rows (the file's own rows are already
    canonical, mirroring ``mapping.standardize(converter_processed)``
    applied only to ``include_mappings``). ``record_id`` stays excluded
    from serialization exactly as the reference excludes the
    ``sssom.record`` hash prefix. Returns the serialized column list.
    """
    existing, prefix_map, metadata = read_sssom_tsv(spark, path)
    incoming = conform_to_mapping_schema(include_mappings)
    if alias_map:
        from sssom_curator_spark.functions.curie_ops import standardize_curie

        for col in ("subject_id", "object_id", "predicate_id"):
            incoming = incoming.withColumn(col, standardize_curie(col, alias_map))
    merged = existing.unionByName(incoming)
    # The write below truncates `path`, which `existing` still lazily
    # reads — materialize the union first so the stream never races the
    # overwrite. The file is human-scale (the reference rewrites it
    # in-memory per insert); at corpus scale this verb is an Iceberg
    # append, not a TSV rewrite.
    merged = merged.localCheckpoint()
    return write_sssom_tsv(
        merged,
        path,
        prefix_map=prefix_map,
        metadata=metadata,
        sort=sort,
        drop_duplicates=True,
        exclude_columns=exclude_columns,
    )


def chain_prefix_maps(maps: list[dict[str, str]]) -> dict[str, str]:
    """U4 converter chain (reference repository.py:276-278 via
    ``curies.chain``): first-wins union of per-file prefix maps — a prefix
    keeps the FIRST URI expansion seen in file order; later conflicting
    expansions for the same prefix are ignored."""
    out: dict[str, str] = {}
    for m in maps:
        for prefix, uri in m.items():
            if prefix not in out:
                out[prefix] = uri
    return out


def lint_frame(
    df: DataFrame,
    *,
    sort: bool = True,
    drop_duplicates: bool = True,
    exclude_mappings: DataFrame | None = None,
    exclude_prefixes: list[str] | None = None,
) -> DataFrame:
    """The lint-on-write transformation stack (S3), fully distributed.

    sort + dedup + curated-exclusion mirror ``sssom_pydantic.write``'s
    keyword surface (constants.py:100-109, predict/lexical.py:513-521).
    Exclusion is a left-anti join on the canonical mapping tuple (J5) — the
    "zombie prediction" removal. At 100 TB both the dedup and the anti-join
    are shuffles on the same canonical key, so Catalyst/AQE reuses the
    exchange; the exclude side (curated mappings, human-scale) broadcasts.
    """
    out = df
    if exclude_prefixes:
        subject_prefix = F.substring_index(F.col("subject_id"), ":", 1)
        object_prefix = F.substring_index(F.col("object_id"), ":", 1)
        out = out.filter(
            ~subject_prefix.isin(exclude_prefixes) & ~object_prefix.isin(exclude_prefixes)
        )
    if exclude_mappings is not None:
        excl = exclude_mappings.select(
            *[F.col(c).alias(f"_x_{c}") for c in CANONICAL_KEY_COLUMNS]
        ).distinct()
        # null-safe equality: predicate_modifier/justification may be null
        cond = None
        for c in CANONICAL_KEY_COLUMNS:
            eq = out[c].eqNullSafe(F.col(f"_x_{c}"))
            cond = eq if cond is None else (cond & eq)
        out = out.join(F.broadcast(excl), on=cond, how="left_anti")
    if drop_duplicates:
        out = out.dropDuplicates(CANONICAL_KEY_COLUMNS)
    if sort:
        out = out.orderBy(*CANONICAL_SORT_COLUMNS)
    return out


def _nonempty_columns(df: DataFrame, candidates: list[str]) -> list[str]:
    """Dynamic column pruning (F9): one aggregation pass, not N count jobs.

    The reference serializes only non-empty columns (compare
    tests/test_init.py:146 vs :184 headers). A single ``max(isNotNull)``
    aggregate per column resolves all of them in one distributed job.
    """
    probes = []
    for name in candidates:
        col = F.col(name)
        if isinstance(df.schema[name].dataType, T.ArrayType):
            probe = F.coalesce(F.size(col) > 0, F.lit(False))
        else:
            probe = col.isNotNull()
        probes.append(F.max(probe).alias(name))
    row = df.select(*probes).first()
    if row is None:  # empty frame: serialize nothing but the identity columns
        return [c for c in candidates if c in set(CANONICAL_KEY_COLUMNS)]
    return [name for name in candidates if row[name]]


def _format_cell(value: Any) -> str:
    if value is None:
        return ""
    if isinstance(value, list):
        return "|".join(str(v) for v in value)
    if isinstance(value, (datetime.date, datetime.datetime)):
        return value.isoformat()
    if isinstance(value, float):
        return repr(value)
    return str(value)


def render_metadata_header(
    prefix_map: dict[str, str], metadata: dict[str, Any] | None = None
) -> str:
    """Render the ``#``-prefixed YAML header, key-sorted, dates quoted —
    byte-compatible with the reference goldens (tests/test_merge.py:87-96)."""
    lines = ["#curie_map:"]
    for prefix in sorted(prefix_map):
        lines.append(f"#  {prefix}: {prefix_map[prefix]}")
    for key in sorted(metadata or {}):
        value = (metadata or {})[key]
        if isinstance(value, (datetime.date, datetime.datetime)):
            value = f"'{value.isoformat()}'"
        lines.append(f"#{key}: {value}")
    return "\n".join(lines)


def write_sssom_tsv(
    df: DataFrame,
    path: str,
    *,
    prefix_map: dict[str, str],
    metadata: dict[str, Any] | None = None,
    sort: bool = True,
    drop_duplicates: bool = True,
    exclude_mappings: DataFrame | None = None,
    exclude_columns: list[str] | None = None,
    exclude_prefixes: list[str] | None = None,
) -> list[str]:
    """SSSOM TSV sink (S3): lint + dynamic columns + metadata header.

    Returns the serialized column list. The lint stack and non-empty-column
    probe run distributed; rows stream to the single TSV through
    ``toLocalIterator`` (one partition in memory at a time), because a
    single ordered TSV file is inherently a driver-side artifact. Scale
    path: write the linted frame to a partitioned table instead.
    """
    linted = lint_frame(
        df,
        sort=sort,
        drop_duplicates=drop_duplicates,
        exclude_mappings=exclude_mappings,
        exclude_prefixes=exclude_prefixes,
    )
    excluded = set(exclude_columns or []) | {"record_id"}
    candidates = [c for c in TSV_COLUMN_ORDER if c not in excluded and c in linted.columns]
    columns = _nonempty_columns(linted, candidates)
    projected = linted.select(*columns)

    header = render_metadata_header(prefix_map, metadata)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w", encoding="utf-8") as handle:
        if header:
            handle.write(header + "\n")
        handle.write("\t".join(columns) + "\n")
        for row in projected.toLocalIterator(prefetchPartitions=True):
            handle.write("\t".join(_format_cell(row[c]) for c in columns) + "\n")
    return columns
