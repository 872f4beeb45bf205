"""Fixed StructTypes for every table the engine touches.

The reference's unit of data is a ``SemanticMapping`` pydantic model — one
row per (subject, predicate, object) edge with provenance metadata
(/root/reference/src/sssom_curator/predict/lexical.py:233-244,
/root/reference/src/sssom_curator/initialize/__init__.py:45-84). Here it is
one DataFrame row with a fixed, columnar schema; CURIEs are stored as
``prefix:identifier`` strings and prefix columns are *derived* with
``substring_index`` so Catalyst can prune/push them.
"""

from __future__ import annotations

from pyspark.sql import types as T

__all__ = [
    "MAPPING_SCHEMA",
    "MAPPING_COLUMNS",
    "CANONICAL_SORT_COLUMNS",
    "CANONICAL_KEY_COLUMNS",
    "TSV_COLUMN_ORDER",
    "PAGES_SCHEMA",
    "LABELS_SCHEMA",
    "XREFS_SCHEMA",
    "EDGES_SCHEMA",
    "PREFIX_MAP_SCHEMA",
    "EMBEDDING_SCHEMA",
    "METRICS_SCHEMA",
    "STATUSES",
]

#: Flat serialized column set of a mapping row. Field inventory follows the
#: reference golden files (/root/reference/tests/test_merge.py:98 and
#: /root/reference/tests/test_init.py:146,164,184); ``record_id`` is the
#: content-hash synthetic PK (web/backends/memory.py:57-62); ``status`` is
#: our columnar encoding of the reference's four-file repository
#: (repository.py:148-151).
MAPPING_SCHEMA = T.StructType(
    [
        T.StructField("subject_id", T.StringType(), False),
        T.StructField("subject_label", T.StringType(), True),
        T.StructField("predicate_id", T.StringType(), False),
        T.StructField("predicate_modifier", T.StringType(), True),
        T.StructField("object_id", T.StringType(), False),
        T.StructField("object_label", T.StringType(), True),
        T.StructField("mapping_justification", T.StringType(), False),
        T.StructField("confidence", T.DoubleType(), True),
        T.StructField("mapping_tool", T.StringType(), True),
        T.StructField("mapping_tool_id", T.StringType(), True),
        T.StructField("mapping_tool_version", T.StringType(), True),
        T.StructField("mapping_date", T.DateType(), True),
        T.StructField("review_date", T.DateType(), True),
        T.StructField("author_id", T.ArrayType(T.StringType()), True),
        T.StructField("reviewer_id", T.ArrayType(T.StringType()), True),
        T.StructField("reviewer_agreement", T.DoubleType(), True),
        T.StructField("subject_source_version", T.StringType(), True),
        T.StructField("object_source_version", T.StringType(), True),
        T.StructField("license", T.StringType(), True),
        T.StructField("record_id", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
    ]
)

MAPPING_COLUMNS = [f.name for f in MAPPING_SCHEMA.fields]

#: Canonical total order of mapping files — the pydantic model's ``__lt__``
#: over (subject, predicate, object, ...) enforced on every write
#: (predict/lexical.py:170, constants.py:106, testing.py:161-195). Golden
#: files pin case-sensitive lexicographic CURIE order
#: (tests/test_merge.py:99-102).
CANONICAL_SORT_COLUMNS = [
    "subject_id",
    "predicate_id",
    "object_id",
    "mapping_justification",
    "predicate_modifier",
    "confidence",
]

#: Identity tuple for dedup / anti-join exclusion (U2/J5): the reference
#: drops duplicates on the full canonical mapping tuple
#: (constants.py:100-109, predict/lexical.py:506-521).
CANONICAL_KEY_COLUMNS = [
    "subject_id",
    "predicate_id",
    "predicate_modifier",
    "object_id",
    "mapping_justification",
]

#: Column order in serialized SSSOM TSV (golden header,
#: /root/reference/tests/test_merge.py:98). ``status`` and raw partitions
#: never serialize; empty columns are pruned dynamically (F9).
TSV_COLUMN_ORDER = [
    "subject_id",
    "subject_label",
    "predicate_id",
    "predicate_modifier",
    "object_id",
    "object_label",
    "mapping_justification",
    "author_id",
    "reviewer_id",
    "mapping_tool",
    "mapping_tool_id",
    "mapping_tool_version",
    "mapping_date",
    "review_date",
    "confidence",
    "reviewer_agreement",
    "subject_source_version",
    "object_source_version",
    "license",
    "record_id",
]

#: Repository states (repository.py:148-151; four files → one status column).
STATUSES = ("predicted", "positive", "negative", "unsure")

#: North-rule input corpus: Common-Crawl-style pages (BASELINE.json
#: input_hint). Partition by days(warc_ts) at scale.
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

#: Lexical-index build side — mirrors gilda grounder entries keyed by
#: normalized text (predict/lexical.py:229, built via pyobo.get_grounder
#: :107-133) and the id->name dimension (:275).
LABELS_SCHEMA = T.StructType(
    [
        T.StructField("prefix", T.StringType(), False),
        T.StructField("identifier", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("norm_text", T.StringType(), False),
        T.StructField("is_synonym", T.BooleanType(), False),
        T.StructField("source_version", T.StringType(), True),
    ]
)

#: Existing-xref anti-join side — mirrors _get_entity_to_mapped_prefixes
#: (predict/lexical.py:388-400).
XREFS_SCHEMA = T.StructType(
    [
        T.StructField("entity_curie", T.StringType(), False),
        T.StructField("mapped_prefix", T.StringType(), False),
    ]
)

#: Undirected mapping-graph edges (export/charts.py:187-217).
EDGES_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
    ]
)

#: Prefix map (curies.Converter) as a small broadcast dimension
#: (constants.py:40-69, repository.py:276-278).
PREFIX_MAP_SCHEMA = T.StructType(
    [
        T.StructField("prefix", T.StringType(), False),
        T.StructField("uri_prefix", T.StringType(), False),
    ]
)

#: Embedding matrix rows (predict/embedding.py:59-61).
EMBEDDING_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    ]
)

#: Per-partition lineage/metrics rows emitted by instrumented stages
#: (north rule: "every stage writes per-partition lineage and metrics rows").
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("rows_in", T.LongType(), False),
        T.StructField("rows_out", T.LongType(), False),
        T.StructField("wall_ms", T.DoubleType(), False),
    ]
)
