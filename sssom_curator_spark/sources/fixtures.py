"""Seeded domain fixtures mirroring the reference's own test data.

Seed mappings = the four examples the reference scaffolds into every new
project (/root/reference/src/sssom_curator/initialize/__init__.py:45-84);
curation fixtures = the wsgi seed pair (tests/wsgi_cases.py:34-47); label
and xref dims follow FIXTURES.md §3–4. Everything is literal rows —
deterministic by construction.
"""

from __future__ import annotations

import datetime

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sssom_curator_spark.curation.state import with_record_id
from sssom_curator_spark.schema import LABELS_SCHEMA, MAPPING_SCHEMA
from sssom_curator_spark.functions.text_norm import normalize_text


def _local_df(spark: SparkSession, rows: list[dict], schema) -> DataFrame:
    """Build a small dimension table through the Arrow path.

    ``createDataFrame`` over a plain Python list parallelizes a pickle RDD
    that re-evaluates through non-Arrow Python workers on EVERY downstream
    use (~0.4 s per evaluation at local[32] vs ~20 ms via Arrow — measured);
    dimension tables are referenced by several pipeline stages, so the
    pickle path turns a 40-row dim into seconds of per-stage overhead.
    """
    cols = [f.name for f in schema.fields] if hasattr(schema, "fields") else None
    pdf = pd.DataFrame(rows, columns=cols)
    return spark.createDataFrame(pdf, schema)

__all__ = [
    "PREFIX_MAP",
    "seed_repository",
    "wsgi_repository",
    "seed_labels",
    "seed_xrefs",
]

#: initialize/__init__.py:174-183 prefix map.
PREFIX_MAP = {
    "CHEBI": "http://purl.obolibrary.org/obo/CHEBI_",
    "mesh": "http://id.nlm.nih.gov/mesh/",
    "orcid": "https://orcid.org/",
    "semapv": "https://w3id.org/semapv/vocab/",
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "wikidata": "http://www.wikidata.org/entity/",
}

_CHARLIE = "orcid:0000-0003-4423-4370"
_DATE = datetime.date(2026, 5, 8)


def _row(**kw) -> dict:
    base = {f.name: None for f in MAPPING_SCHEMA.fields}
    base.update(kw)
    return base


def seed_repository(spark: SparkSession) -> DataFrame:
    """The four scaffold mappings (initialize/__init__.py:45-84) as one
    status-tagged table: positive, negative, predicted, unsure."""
    rows = [
        _row(
            subject_id="CHEBI:11986",
            subject_label="4-fluoro-L-threonine",
            predicate_id="skos:exactMatch",
            object_id="mesh:C048271",
            object_label="4-fluorothreonine",
            mapping_justification="semapv:ManualMappingCuration",
            author_id=[_CHARLIE],
            mapping_date=_DATE,
            confidence=1.0,
            status="positive",
        ),
        _row(
            subject_id="CHEBI:10057",
            subject_label="9H-xanthene",
            predicate_id="skos:exactMatch",
            predicate_modifier="Not",
            object_id="mesh:C002563",
            object_label="xanthan gum",
            mapping_justification="semapv:ManualMappingCuration",
            author_id=[_CHARLIE],
            mapping_date=_DATE,
            confidence=1.0,
            status="negative",
        ),
        _row(
            subject_id="CHEBI:101096",
            subject_label="ethoxzolamide",
            predicate_id="skos:exactMatch",
            object_id="mesh:C523270",
            object_label="6-ethoxybenzothiazole-2-sulfonamide",
            mapping_justification="semapv:LexicalMatching",
            mapping_tool="sssom-curator",
            mapping_tool_id="wikidata:Q138902949",
            mapping_tool_version="0.4.2",
            confidence=0.77,
            status="predicted",
        ),
        _row(
            subject_id="CHEBI:61700",
            subject_label="(+)-valencene",
            predicate_id="skos:exactMatch",
            object_id="mesh:C506706",
            object_label="valencene",
            mapping_justification="semapv:ManualMappingCuration",
            reviewer_id=[_CHARLIE],
            review_date=_DATE,
            reviewer_agreement=0.0,
            status="unsure",
        ),
    ]
    return with_record_id(_local_df(spark, rows, MAPPING_SCHEMA))


def wsgi_repository(spark: SparkSession) -> DataFrame:
    """The wsgi seed pair (tests/wsgi_cases.py:34-47): one curated positive
    plus one prediction at confidence 0.95."""
    rows = [
        _row(
            subject_id="chebi:131408",
            subject_label="glyoxime",
            predicate_id="skos:exactMatch",
            object_id="mesh:C018305",
            object_label="glyoxal dioxime",
            mapping_justification="semapv:ManualMappingCuration",
            status="positive",
        ),
        _row(
            subject_id="chebi:133530",
            subject_label="tyramine sulfate",
            predicate_id="skos:exactMatch",
            object_id="mesh:C027957",
            object_label="tyramine O-sulfate",
            mapping_justification="semapv:LexicalMatching",
            confidence=0.95,
            mapping_tool="test",
            status="predicted",
        ),
    ]
    return with_record_id(_local_df(spark, rows, MAPPING_SCHEMA))


def seed_labels(spark: SparkSession, *, hub_copies: int = 0) -> DataFrame:
    """Two-namespace label dim with overlapping normalized names
    (FIXTURES.md §3): exact cross-namespace collisions for the all-by-all
    fixture, plus an optional hub name shared by many ids (skew fixture)."""
    rows = [
        ("CHEBI", "18145", "alpha-Tocopherol", False),
        ("mesh", "D024502", "alpha tocopherol", False),
        ("CHEBI", "61700", "(+)-valencene", False),
        ("mesh", "C506706", "valencene", True),
        ("CHEBI", "131408", "glyoxime", False),
        ("mesh", "C018305", "glyoxal dioxime", False),
        ("CHEBI", "133530", "tyramine sulfate", False),
        ("mesh", "C027957", "tyramine O-sulfate", False),
        ("CHEBI", "101096", "ethoxzolamide", False),
        ("mesh", "C523270", "ethoxzolamide", True),
        ("CHEBI", "28499", "xanthan gum", False),
        ("mesh", "C002563", "xanthan gum", False),
        ("CHEBI", "82794", "fluorothreonine", False),
        ("CHEBI", "9921", "visnadin", False),
        ("mesh", "C067604", "visnadin", False),
    ]
    for i in range(hub_copies):
        rows.append(("mesh", f"HUB{i:04d}", "aspirin", True))
    data = [
        {
            "prefix": p,
            "identifier": i,
            "name": n,
            "norm_text": normalize_text(n),
            "is_synonym": syn,
            "source_version": "2026-01",
        }
        for p, i, n, syn in rows
    ]
    return _local_df(spark, data, LABELS_SCHEMA)


def seed_xrefs(spark: SparkSession) -> DataFrame:
    """Existing-xrefs anti-join fixture (predict/lexical.py:388-400)."""
    rows = [
        {"entity_curie": "CHEBI:101096", "mapped_prefix": "mesh"},  # dropped by J6
        {"entity_curie": "mesh:C523270", "mapped_prefix": "CHEBI"},
    ]
    pdf = pd.DataFrame(rows, columns=["entity_curie", "mapped_prefix"])
    return spark.createDataFrame(pdf, "entity_curie string, mapped_prefix string")
