"""Scalar-function kit: column expressions first, pandas UDFs second.

Everything here that can be a JVM-side column expression is one (stays
inside whole-stage codegen); Python appears only in Arrow-batched pandas
helpers used by the grounding/scoring operators.
"""

from sssom_curator_spark.functions.curie_ops import (
    curie_prefix,
    expand_curie,
    record_hash,
    standardize_curie,
)
from sssom_curator_spark.functions.pii_ops import (
    PII_PATTERNS,
    pii_counts,
    redact_pii,
    scrub_pii,
)
from sssom_curator_spark.functions.text_norm import norm_text_col, normalize_text
from sssom_curator_spark.functions.scoring import score_match_batch, SCORING_WEIGHTS

__all__ = [
    "PII_PATTERNS",
    "pii_counts",
    "redact_pii",
    "scrub_pii",
    "curie_prefix",
    "expand_curie",
    "record_hash",
    "standardize_curie",
    "norm_text_col",
    "normalize_text",
    "score_match_batch",
    "SCORING_WEIGHTS",
]
