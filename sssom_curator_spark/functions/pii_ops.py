"""PII detection and redaction — the compliance scrub every web-corpus
pipeline runs before training-data release (emails, IPv4 addresses,
phone numbers replaced by typed placeholder tokens).

Not present in the reference (its inputs are curated ontology mappings,
not raw crawl text); sibling of the corpus-hygiene operators in
``operators/``. Pure column expressions — every pattern compiles in both
Java regex (Spark) and RE2 (DuckDB): character classes, bounded repeats
and ``\\b`` word boundaries only, no lookaround and no backreferences —
so the whole scrub stays inside whole-stage codegen and is replayable by
the ANSI-SQL oracle verbatim.

Scale shape: a map-side projection. No shuffle, no UDF, no state — at
100 TB this is a pure scan transform that fuses into whatever stage
consumes it (typically the quality-filter projection before mention
detection).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["PII_PATTERNS", "redact_pii", "pii_counts", "scrub_pii"]

#: kind -> (pattern, replacement). Ordered: emails are redacted first so
#: their digit runs can never be re-matched by the narrower patterns.
#: Patterns restrict themselves to the Java-regex ∩ RE2 dialect (the
#: DuckDB oracle runs them unchanged).
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
}


def redact_pii(col: Column | str, kinds: tuple[str, ...] | None = None) -> Column:
    """Replace every PII match in ``col`` with its placeholder token.

    Applies the ``PII_PATTERNS`` replacements in declaration order
    (email → ipv4 → phone); Spark's ``regexp_replace`` is global, like
    the oracle's ``regexp_replace(…, 'g')``. Idempotent: placeholder
    tokens contain no characters any pattern can match.
    """
    out = F.col(col) if isinstance(col, str) else col
    for kind in kinds or tuple(PII_PATTERNS):
        pattern, token = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pattern, token)
    return out


def pii_counts(
    col: Column | str, kinds: tuple[str, ...] | None = None
) -> dict[str, Column]:
    """Per-kind match counts over the RAW text (kind -> Column).

    Counts are computed independently per pattern before any redaction,
    so a string matched by two kinds is counted by both — the audit
    answer to "how much of each PII type did this shard contain".
    """
    src = F.col(col) if isinstance(col, str) else col
    return {
        kind: F.regexp_count(src, F.lit(PII_PATTERNS[kind][0])).alias(f"n_{kind}")
        for kind in (kinds or tuple(PII_PATTERNS))
    }


def scrub_pii(
    df: DataFrame,
    *,
    text_col: str = "text",
    kinds: tuple[str, ...] | None = None,
) -> DataFrame:
    """Rewrite ``text_col`` with PII redacted and append one ``n_<kind>``
    count column per pattern (counts taken on the pre-redaction text).

    One projection, zero shuffles; safe to run as the first stage of any
    scan at any scale.
    """
    counts = pii_counts(F.col(text_col), kinds)
    return df.select(
        *[c for c in df.columns if c != text_col],
        redact_pii(F.col(text_col), kinds).alias(text_col),
        *counts.values(),
    )
