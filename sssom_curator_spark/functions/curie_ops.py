"""CURIE column operations (SURVEY.md C5/C6/C7) — pure column expressions.

The reference leans on ``curies.Converter`` for prefix standardization and
URI expansion (constants.py:40-69, export/merge.py:150,155-156; golden
behavior ``chebi``→``CHEBI`` in tests/test_merge.py:109-133) and hashes each
mapping into a content-addressed record reference
(web/backends/base.py:38,44-46, web/backends/memory.py:57-62). All four
become JVM-side expressions over a *broadcast* prefix dimension — no Python
in the hot path, full whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["curie_prefix", "curie_identifier", "standardize_curie", "expand_curie", "record_hash"]


def curie_prefix(col: Column | str) -> Column:
    """``prefix`` from a ``prefix:identifier`` CURIE string."""
    return F.substring_index(col, ":", 1)


def curie_identifier(col: Column | str) -> Column:
    """``identifier`` from a CURIE — everything after the first colon
    (MeSH-style identifiers may themselves contain colons)."""
    c = F.col(col) if isinstance(col, str) else col
    prefix_len = F.length(F.substring_index(c, ":", 1))
    return c.substr(prefix_len + 2, F.length(c))


def standardize_curie(col: Column | str, alias_map: dict[str, str]) -> Column:
    """Prefix standardization (C5): ``chebi:10001`` → ``CHEBI:10001``.

    ``alias_map`` maps non-canonical → canonical prefixes. Small by nature
    (a prefix map is tens of rows), so it inlines as a literal MAP lookup —
    constant-folded by Catalyst, no join, no shuffle.
    """
    c = F.col(col) if isinstance(col, str) else col
    prefix = curie_prefix(c)
    if alias_map:
        mapping = F.create_map(*[F.lit(x) for kv in alias_map.items() for x in kv])
        canonical = F.coalesce(mapping[prefix], prefix)
    else:
        canonical = prefix
    # Null-preserving: concat_ws would silently turn a NULL CURIE into ""
    # (insert() would then rewrite a legitimately-null optional column);
    # standardization of nothing is nothing.
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat_ws(":", canonical, curie_identifier(c))
    )


def expand_curie(col: Column | str, prefix_map: dict[str, str]) -> Column:
    """CURIE → URI expansion (C6) against a literal prefix map; unmapped
    prefixes yield null (the Converter's strict=False behavior)."""
    c = F.col(col) if isinstance(col, str) else col
    mapping = F.create_map(*[F.lit(x) for kv in prefix_map.items() for x in kv])
    uri_prefix = mapping[curie_prefix(c)]
    return F.when(uri_prefix.isNotNull(), F.concat(uri_prefix, curie_identifier(c)))


def record_hash(df_or_cols: DataFrame | None = None) -> Column:
    """Mapping content hash (C7) — the synthetic PK the curation state
    machine keys MERGEs on (web/backends/memory.py:57-62).

    sha256 over the canonical identity tuple, ``|``-delimited with a
    sentinel for nulls so (a, null) never collides with (a, '').
    """
    parts = [
        "subject_id",
        "predicate_id",
        "predicate_modifier",
        "object_id",
        "mapping_justification",
    ]
    payload = F.concat_ws("|", *[F.coalesce(F.col(p), F.lit("\x00")) for p in parts])
    return F.sha2(payload, 256)
