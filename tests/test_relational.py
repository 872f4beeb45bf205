"""Relational kit + Query/State plan builder + pagination semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from sssom_curator_spark.operators.relational import (
    confidence_cutoff,
    exclude_curated,
    exclude_existing_xrefs,
    exclude_same_component,
    merge_repository,
    paginate,
    prefix_pair_counts,
    prefix_pair_filter,
    semra_import_filter,
)
from sssom_curator_spark.plans.state_query import QueryState, apply_state
from sssom_curator_spark.schema import STATUSES
from sssom_curator_spark.sources.fixtures import seed_repository, seed_xrefs


def _repo(spark):
    return seed_repository(spark)


class TestFilters:
    def test_prefix_pair_filter(self, spark):
        assert prefix_pair_filter(_repo(spark), ["CHEBI", "mesh"]).count() == 4
        assert prefix_pair_filter(_repo(spark), ["CHEBI"]).count() == 0

    def test_semra_import_filter(self, spark):
        repo = _repo(spark).withColumn(
            "license", F.lit("https://creativecommons.org/publicdomain/zero/1.0/")
        )
        out = semra_import_filter(repo, ["CHEBI", "mesh"])
        # only the LexicalMatching prediction passes (manual rows excluded)
        rows = out.collect()
        assert len(rows) == 1
        assert rows[0]["mapping_justification"] == "semapv:LexicalMatching"

    def test_confidence_cutoff(self, spark):
        assert confidence_cutoff(_repo(spark), 0.8).count() == 2  # 1.0, 1.0


class TestAntiJoins:
    def test_exclude_curated_null_safe(self, spark):
        repo = _repo(spark)
        pred = repo.filter(F.col("status") == "predicted")
        assert exclude_curated(pred, pred).count() == 0
        curated = repo.filter(F.col("status") != "predicted")
        assert exclude_curated(pred, curated).count() == 1  # disjoint tuples

    def test_exclude_existing_xrefs_symmetric(self, spark):
        pred = _repo(spark).filter(F.col("status") == "predicted")
        # fixture xref: CHEBI:101096 already mapped into mesh → dropped
        assert exclude_existing_xrefs(pred, seed_xrefs(spark)).count() == 0
        other = spark.createDataFrame(
            [("CHEBI:999", "doid")], "entity_curie string, mapped_prefix string"
        )
        assert exclude_existing_xrefs(pred, other).count() == 1

    def test_exclude_same_component(self, spark):
        pred = _repo(spark).filter(F.col("status") == "predicted")
        comps = spark.createDataFrame(
            [("CHEBI:101096", "x"), ("mesh:C523270", "x")], "node string, component string"
        )
        assert exclude_same_component(pred, comps).count() == 0
        comps2 = spark.createDataFrame(
            [("CHEBI:101096", "x"), ("mesh:C523270", "y")], "node string, component string"
        )
        assert exclude_same_component(pred, comps2).count() == 1


class TestMergeAndAggs:
    def test_merge_preserves_status(self, spark):
        repo = _repo(spark)
        frames = {s: repo.filter(F.col("status") == s).drop("status") for s in STATUSES}
        merged = merge_repository(frames)
        assert merged.count() == 4
        assert {r["status"] for r in merged.select("status").collect()} == set(STATUSES)

    def test_prefix_pair_counts_symmetric(self, spark):
        flipped = _repo(spark).withColumns(
            {"subject_id": F.col("object_id"), "object_id": F.col("subject_id")}
        )
        a = prefix_pair_counts(_repo(spark)).collect()
        b = prefix_pair_counts(flipped).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]


class TestPagination:
    def test_offset_limit_deterministic(self, spark):
        repo = _repo(spark)
        page1 = [r["subject_id"] for r in paginate(repo, sort="desc", offset=0, limit=2).collect()]
        page2 = [r["subject_id"] for r in paginate(repo, sort="desc", offset=2, limit=2).collect()]
        assert len(page1) == 2 and len(page2) == 2
        assert not set(page1) & set(page2)
        again = [r["subject_id"] for r in paginate(repo, sort="desc", offset=0, limit=2).collect()]
        assert page1 == again


class TestQueryState:
    def test_prefix_and_query_filters(self, spark):
        repo = _repo(spark)
        out = apply_state(repo, QueryState(subject_prefix="CHEBI"), paginated=False)
        assert out.count() == 4
        out = apply_state(repo, QueryState(query="valencene"), paginated=False)
        assert out.count() == 1
        out = apply_state(repo, QueryState(object_query="xanthan"), paginated=False)
        assert out.count() == 1

    def test_same_text(self, spark):
        repo = _repo(spark).withColumn(
            "object_label", F.when(F.col("subject_id") == "CHEBI:11986", "4-FLUORO-L-THREONINE").otherwise(F.col("object_label"))
        )
        out = apply_state(repo, QueryState(same_text=True), paginated=False)
        assert [r["subject_id"] for r in out.collect()] == ["CHEBI:11986"]

    def test_target_references(self, spark):
        out = apply_state(
            _repo(spark),
            QueryState(target_references=["mesh:C048271"]),
            paginated=False,
        )
        assert out.count() == 1

    def test_pagination_defaults(self, spark):
        out = apply_state(_repo(spark), QueryState())
        assert out.count() == 4  # limit 10 > 4 rows


class TestEnrichNames:
    def test_missing_labels_filled_existing_win(self, spark):
        from sssom_curator_spark.operators.relational import enrich_names
        from sssom_curator_spark.sources.fixtures import seed_labels

        rows = [
            ("CHEBI:61700", None, "mesh:C506706", "kept-label"),
            ("CHEBI:9921", None, "unknown:X", None),
        ]
        maps = spark.createDataFrame(
            rows, "subject_id string, subject_label string, object_id string, object_label string"
        )
        out = {
            r["subject_id"]: (r["subject_label"], r["object_label"])
            for r in enrich_names(maps, seed_labels(spark)).collect()
        }
        assert out["CHEBI:61700"] == ("(+)-valencene", "kept-label")
        assert out["CHEBI:9921"] == ("visnadin", None)


class TestMappingGraphEdges:
    def test_include_exclude_predicates(self, spark):
        import datetime

        from sssom_curator_spark.export.summary import mapping_graph_edges
        from sssom_curator_spark.schema import MAPPING_SCHEMA

        def row(s, o, pred, status="positive", modifier=None):
            base = {f.name: None for f in MAPPING_SCHEMA.fields}
            base.update(
                subject_id=s, predicate_id=pred, object_id=o,
                mapping_justification="semapv:ManualMappingCuration",
                predicate_modifier=modifier, status=status,
                mapping_date=datetime.date(2026, 1, 1),
            )
            return base

        repo = spark.createDataFrame(
            [
                row("a:1", "b:1", "skos:exactMatch"),
                row("a:2", "b:2", "skos:broadMatch"),
                row("a:3", "b:3", "skos:exactMatch", modifier="Not"),
                row("a:4", "b:4", "skos:exactMatch", status="predicted"),
            ],
            MAPPING_SCHEMA,
        )
        all_pos = {r["src"] for r in mapping_graph_edges(repo).collect()}
        assert all_pos == {"a:1", "a:2"}  # Not-modified + predicted dropped
        only_exact = {
            r["src"]
            for r in mapping_graph_edges(
                repo, include_predicates=["skos:exactMatch"]
            ).collect()
        }
        assert only_exact == {"a:1"}
        no_broad = {
            r["src"]
            for r in mapping_graph_edges(
                repo, exclude_predicates=["skos:broadMatch"]
            ).collect()
        }
        assert no_broad == {"a:1"}
