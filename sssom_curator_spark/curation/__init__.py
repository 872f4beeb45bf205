"""Curation state machine over the mapping repository table."""

from sssom_curator_spark.curation.state import (
    MARK_TO_STATUS,
    CurationSession,
    apply_marks,
)

__all__ = ["apply_marks", "MARK_TO_STATUS", "CurationSession"]
