"""Scalar function kit: normalization parity, CURIE ops, scoring."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sssom_curator_spark.functions.curie_ops import (
    curie_identifier,
    curie_prefix,
    expand_curie,
    record_hash,
    standardize_curie,
)
from sssom_curator_spark.functions.scoring import score_match_batch
from sssom_curator_spark.functions.text_norm import normalize_text, norm_text_col

TEXT_ALPHABET = st.characters(
    whitelist_categories=("Ll", "Lu", "Nd", "Zs", "Pd"),
    whitelist_characters="αβγδ–—‐  -",
)


class TestNormalization:
    def test_examples(self, spark):
        cases = [
            ("α-Tocopherol", "alpha tocopherol"),
            ("Alpha–Tocopherol  Acetate", "alpha tocopherol acetate"),
            ("  spaced\tout ", "spaced out"),
            ("ω-3 fatty acid", "omega 3 fatty acid"),
        ]
        for raw, expected in cases:
            assert normalize_text(raw) == expected
        df = spark.createDataFrame([(r,) for r, _ in cases], "name string")
        got = [r["n"] for r in df.select(norm_text_col("name").alias("n")).collect()]
        assert got == [e for _, e in cases]

    @given(st.lists(st.text(TEXT_ALPHABET, max_size=30), min_size=1, max_size=20))
    @settings(max_examples=20, deadline=None)
    def test_python_matches_column_expression(self, texts):
        # property: the pandas-UDF-side and JVM-side normalization agree
        # byte-for-byte on arbitrary inputs (SURVEY.md C1).
        spark = get_cached_spark()
        df = spark.createDataFrame([(t,) for t in texts], "name string")
        got = [r["n"] for r in df.select(norm_text_col("name").alias("n")).collect()]
        assert got == [normalize_text(t) for t in texts]


_CACHED = {}


def get_cached_spark():
    if "s" not in _CACHED:
        from sssom_curator_spark.session import get_spark

        _CACHED["s"] = get_spark(master="local[4]")
    return _CACHED["s"]


class TestCurieOps:
    def test_prefix_identifier(self, spark):
        df = spark.createDataFrame([("mesh:C048:271",)], "c string")
        row = df.select(
            curie_prefix("c").alias("p"), curie_identifier("c").alias("i")
        ).first()
        assert row["p"] == "mesh"
        assert row["i"] == "C048:271"

    def test_standardize(self, spark):
        # golden behavior chebi→CHEBI (tests/test_merge.py:109-133)
        df = spark.createDataFrame([("chebi:10001",), ("mesh:C1",), (None,)], "c string")
        got = [
            r["s"]
            for r in df.select(standardize_curie("c", {"chebi": "CHEBI"}).alias("s")).collect()
        ]
        # null stays null (not "") — insert() must not rewrite legitimately-
        # null optional CURIE columns on incoming rows
        assert got == ["CHEBI:10001", "mesh:C1", None]

    def test_expand(self, spark):
        df = spark.createDataFrame([("CHEBI:10001",), ("nope:1",)], "c string")
        got = [
            r["u"]
            for r in df.select(
                expand_curie("c", {"CHEBI": "http://purl.obolibrary.org/obo/CHEBI_"}).alias("u")
            ).collect()
        ]
        assert got == ["http://purl.obolibrary.org/obo/CHEBI_10001", None]

    def test_record_hash_distinguishes_nulls(self, spark):
        df = spark.createDataFrame(
            [
                ("a:1", "skos:exactMatch", None, "b:1", "semapv:LexicalMatching"),
                ("a:1", "skos:exactMatch", "Not", "b:1", "semapv:LexicalMatching"),
            ],
            "subject_id string, predicate_id string, predicate_modifier string,"
            "object_id string, mapping_justification string",
        )
        hashes = [r["h"] for r in df.select(record_hash().alias("h")).collect()]
        assert hashes[0] != hashes[1]
        assert all(len(h) == 64 for h in hashes)


class TestScoring:
    def test_exact_match_scores_high(self):
        s = score_match_batch(pd.Series(["alpha tocopherol"]), pd.Series(["alpha tocopherol"]))
        assert s.iloc[0] >= 0.95

    def test_disjoint_scores_low(self):
        s = score_match_batch(pd.Series(["alpha tocopherol"]), pd.Series(["zinc oxide"]))
        assert s.iloc[0] < 0.65

    def test_partial_between(self):
        s = score_match_batch(
            pd.Series(["alpha tocopherol acetate"]), pd.Series(["alpha tocopherol"])
        )
        assert 0.0 < s.iloc[0] < 1.0

    def test_rounded_three_places(self):
        s = score_match_batch(pd.Series(["abc xy"]), pd.Series(["abc zq"]))
        assert float(s.iloc[0]) == round(float(s.iloc[0]), 3)


class TestConfidenceBand:
    def test_bands_match_reference_progress_color(self, spark):
        """home.html:7-15 progress_color with the int-truncation the
        template applies before comparing."""
        from pyspark.sql import functions as F

        from sssom_curator_spark.functions.scoring import confidence_band

        rows = [(0.99,), (0.855,), (0.86,), (0.61,), (0.6,), (0.3,), (None,)]
        df = spark.createDataFrame(rows, "confidence double")
        got = [
            r["band"]
            for r in df.select(confidence_band("confidence").alias("band")).collect()
        ]
        assert got == ["success", "warning", "success", "warning", "danger", "danger", None]


class TestSlugAndConfig:
    def test_slugify(self):
        from sssom_curator_spark.initialize import slugify_title

        assert slugify_title("My Mapping Set") == "my-mapping-set"

    def test_config_roundtrip_and_validation(self, spark, tmp_path):
        import pytest

        from sssom_curator_spark.initialize import initialize_project, load_project_config

        cfg = initialize_project(
            spark, str(tmp_path / "p"), mapping_set_id="https://example.org/ms/y"
        )
        loaded = load_project_config(str(tmp_path / "p"))
        assert loaded == cfg
        bad = tmp_path / "bad.json"
        bad.write_text("{}")
        with pytest.raises(ValueError, match="missing required keys"):
            load_project_config(str(bad))
