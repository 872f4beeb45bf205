"""Curation state machine vs the reference's golden transitions
(/root/reference/tests/wsgi_cases.py:50-93,199-323)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from sssom_curator_spark.curation.state import apply_marks
from sssom_curator_spark.sources.fixtures import wsgi_repository

TODAY = datetime.date(2026, 8, 16)
USER = "orcid:0000-0000-0000-0000"


def _marked(spark, mark):
    repo = wsgi_repository(spark)
    marks = repo.filter(F.col("status") == "predicted").select(
        "record_id", F.lit(mark).alias("mark")
    )
    out = apply_marks(repo, marks, author=USER, today=TODAY)
    return {r["status"]: r.asDict() for r in out.collect()}


class TestMarks:
    def test_correct(self, spark):
        got = _marked(spark, "correct")
        assert set(got) == {"positive"} or len(got) == 2
        rows = _marked(spark, "correct")
        cur = rows["positive"]
        # seeded positive also has status positive; find the curated one
        out = [
            r.asDict()
            for r in apply_marks(
                wsgi_repository(spark),
                wsgi_repository(spark)
                .filter(F.col("status") == "predicted")
                .select("record_id", F.lit("correct").alias("mark")),
                author=USER,
                today=TODAY,
            ).collect()
            if r["subject_id"] == "chebi:133530"
        ]
        assert len(out) == 1
        m = out[0]
        # golden: TEST_PREDICTED_MAPPING_MARKED_TRUE (wsgi_cases.py:50-57)
        assert m["status"] == "positive"
        assert m["mapping_justification"] == "semapv:ManualMappingCuration"
        assert m["author_id"] == [USER]
        assert m["mapping_date"] == TODAY
        assert m["confidence"] is None
        assert m["mapping_tool"] is None
        assert m["predicate_id"] == "skos:exactMatch"
        assert m["predicate_modifier"] is None

    def _one(self, spark, mark):
        repo = wsgi_repository(spark)
        marks = repo.filter(F.col("status") == "predicted").select(
            "record_id", F.lit(mark).alias("mark")
        )
        out = apply_marks(repo, marks, author=USER, today=TODAY)
        rows = [r.asDict() for r in out.collect() if r["subject_id"] == "chebi:133530"]
        assert len(rows) == 1
        return rows[0]

    def test_incorrect(self, spark):
        m = self._one(spark, "incorrect")
        # golden: MARKED_FALSE (wsgi_cases.py:86-93)
        assert m["status"] == "negative"
        assert m["predicate_modifier"] == "Not"
        assert m["predicate_id"] == "skos:exactMatch"
        assert m["mapping_justification"] == "semapv:ManualMappingCuration"
        assert m["author_id"] == [USER]
        assert m["confidence"] is None

    def test_unsure(self, spark):
        m = self._one(spark, "unsure")
        # golden: MARKED_UNSURE (wsgi_cases.py:58-68): prediction row kept
        # intact, reviewer fields added
        assert m["status"] == "unsure"
        assert m["mapping_justification"] == "semapv:LexicalMatching"
        assert m["confidence"] == 0.95
        assert m["mapping_tool"] == "test"
        assert m["reviewer_id"] == [USER]
        assert m["review_date"] == TODAY
        assert m["reviewer_agreement"] == 0.0
        assert m["author_id"] is None

    def test_broad(self, spark):
        m = self._one(spark, "BROAD")
        assert m["status"] == "positive"
        assert m["predicate_id"] == "skos:broadMatch"
        assert m["mapping_justification"] == "semapv:ManualMappingCuration"

    def test_narrow(self, spark):
        m = self._one(spark, "NARROW")
        assert m["status"] == "positive"
        assert m["predicate_id"] == "skos:narrowMatch"

    def test_positive_seed_untouched(self, spark):
        repo = wsgi_repository(spark)
        marks = repo.filter(F.col("status") == "predicted").select(
            "record_id", F.lit("correct").alias("mark")
        )
        out = apply_marks(repo, marks, author=USER, today=TODAY)
        seed = [r.asDict() for r in out.collect() if r["subject_id"] == "chebi:131408"]
        assert len(seed) == 1
        assert seed[0]["status"] == "positive"
        assert seed[0]["author_id"] is None  # untouched

    def test_record_id_refreshed(self, spark):
        repo = wsgi_repository(spark)
        before = {
            r["subject_id"]: r["record_id"] for r in repo.collect()
        }
        m = self._one(spark, "incorrect")
        assert m["record_id"] != before["chebi:133530"]
        assert len(m["record_id"]) == 64


class TestCurationSession:
    """A8 running counters (reference base.py:40,72-74, memory.py:118,125-136):
    total_curated accumulates forever; count_unpersisted resets on persist;
    marks on ineligible (non-predicted) rows count in neither."""

    def test_counter_deltas_across_mark_persist_cycle(self, spark, tmp_path):
        from sssom_curator_spark.curation.state import CurationSession

        sess = CurationSession(wsgi_repository(spark))
        assert (sess.total_curated, sess.count_unpersisted()) == (0, 0)

        predicted = sess.repository.filter(F.col("status") == "predicted")
        n_pred = predicted.count()
        assert n_pred >= 1
        sess.mark(
            predicted.select("record_id", F.lit("correct").alias("mark")),
            author=USER,
            today=TODAY,
        )
        assert sess.total_curated == n_pred
        assert sess.count_unpersisted() == n_pred

        out = str(tmp_path / "repo.parquet")
        assert sess.persist(out) == n_pred
        assert sess.count_unpersisted() == 0
        assert sess.total_curated == n_pred  # never reset
        assert spark.read.parquet(out).count() == sess.repository.count()

        # second batch targets rows that are no longer predicted → no-op
        stale = sess.repository.select("record_id", F.lit("correct").alias("mark"))
        already = sess.repository.filter(F.col("status") == "predicted").count()
        sess.mark(stale, author=USER, today=TODAY)
        assert sess.total_curated == n_pred + already
        assert sess.count_unpersisted() == already


class TestCurationSessionCounting:
    def test_duplicate_repository_rows_count_once_per_mark(self, spark):
        """A mark's increment is per-MARK, not per matching repository row:
        duplicate record_ids in the repository must not overcount
        (reference base.py:72-74 bumps once per curated mapping)."""
        from sssom_curator_spark.curation.state import CurationSession

        repo = wsgi_repository(spark)
        predicted = repo.filter(F.col("status") == "predicted")
        n_pred = predicted.count()
        assert n_pred >= 1
        # duplicate every row: same record_ids appear twice
        sess = CurationSession(repo.unionByName(repo))
        sess.mark(
            predicted.select("record_id", F.lit("correct").alias("mark")),
            author=USER,
            today=TODAY,
        )
        assert sess.total_curated == n_pred  # not 2 × n_pred

    def test_many_batches_checkpoint_keeps_counters_exact(self, spark):
        """Crossing the lineage-checkpoint cadence (every 8 batches) must
        not disturb the counters or the table contents."""
        from sssom_curator_spark.curation.state import CurationSession

        repo = wsgi_repository(spark)
        sess = CurationSession(repo)
        ids = [
            r["record_id"]
            for r in sess.repository.filter(F.col("status") == "predicted")
            .select("record_id")
            .collect()
        ]
        assert len(ids) >= 1
        marked = 0
        for i in range(10):  # > CHECKPOINT_EVERY
            target = ids[i % len(ids)]
            before = (
                sess.repository.filter(
                    (F.col("record_id") == target) & (F.col("status") == "predicted")
                ).count()
            )
            sess.mark(
                spark.createDataFrame(
                    [(target, "correct")], "record_id string, mark string"
                ),
                author=USER,
                today=TODAY,
            )
            marked += 1 if before else 0
        assert sess.total_curated == marked
        assert sess.count_unpersisted() == marked
        assert sess.repository.count() == repo.count()
