"""IO layer: SSSOM TSV at the fixture boundary, Parquet/Iceberg-style tables at scale."""

from sssom_curator_spark.io.sssom_tsv import (
    insert_sssom_tsv,
    lint_frame,
    read_sssom_tsv,
    write_sssom_tsv,
)

__all__ = ["read_sssom_tsv", "write_sssom_tsv", "lint_frame", "insert_sssom_tsv"]
