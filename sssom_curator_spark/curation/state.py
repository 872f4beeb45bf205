"""Curation state machine (SURVEY.md C9 + §1.2) as a batch MERGE.

The reference's curation moves a row from the predictions file into one of
positive/negative/unsure, rewriting it in flight (predicate for
BROAD/NARROW, ``predicate_modifier="Not"`` for incorrect, justification →
ManualMappingCuration, author/reviewer + date stamps) — state transition
code /root/reference/src/sssom_curator/web/backends/memory.py:94-153,
golden post-states /root/reference/tests/wsgi_cases.py:50-93,199-323.

Spark disposition: the four files are one table with a ``status`` column;
a batch of marks is a small DataFrame ``(record_id, mark)`` broadcast
against the predictions partition; the transform is a single
``when``/``otherwise`` projection; "persist" is the union of untouched
rows and transformed rows — on Iceberg this is literally ``MERGE INTO``
keyed on ``record_id``, here expressed engine-agnostically. Curation
volume is human-scale, so the marks side always broadcasts and the only
large-data cost is one scan of predictions.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sssom_curator_spark.functions.curie_ops import record_hash

__all__ = [
    "MARK_TO_STATUS",
    "MARK_TO_PREDICATE",
    "apply_marks",
    "with_record_id",
    "CurationSession",
]

#: Routing of marks to repository states (memory.py MARK_TO_CALL semantics;
#: BROAD/NARROW land in positive per the golden models wsgi_cases.py:69-85).
MARK_TO_STATUS = {
    "correct": "positive",
    "BROAD": "positive",
    "NARROW": "positive",
    "incorrect": "negative",
    "unsure": "unsure",
}

#: Predicate rewrite for hierarchical curations (wsgi_cases.py:69-85).
MARK_TO_PREDICATE = {
    "BROAD": "skos:broadMatch",
    "NARROW": "skos:narrowMatch",
}

MANUAL = "semapv:ManualMappingCuration"


def with_record_id(df: DataFrame) -> DataFrame:
    """Stamp the content-hash PK (C7) on rows that lack it."""
    return df.withColumn("record_id", F.coalesce(F.col("record_id"), record_hash()))


def apply_marks(
    repository: DataFrame,
    marks: DataFrame,
    *,
    author: str,
    today: datetime.date | None = None,
    add_date: bool = True,
) -> DataFrame:
    """Apply a batch of curation marks; returns the new repository table.

    ``repository``: mapping table with ``status`` (only ``predicted`` rows
    are eligible — marking a non-prediction is a no-op, mirroring the
    reference's KeyError guard at memory.py:115-116 without failing the
    batch). ``marks``: ``(record_id, mark)`` with mark ∈
    {correct, incorrect, unsure, BROAD, NARROW}.

    Golden semantics (wsgi_cases.py:50-93):

    - correct/BROAD/NARROW/incorrect: justification → ManualMappingCuration,
      ``author_id`` set, ``mapping_date`` stamped, prediction provenance
      (confidence, mapping_tool*) cleared;
    - BROAD/NARROW additionally rewrite the predicate;
    - incorrect additionally sets ``predicate_modifier = 'Not'``;
    - unsure keeps the prediction row intact (justification, confidence,
      tool) and adds ``reviewer_id``, ``review_date``,
      ``reviewer_agreement = 0.0``.
    """
    date_lit = F.lit(today) if today is not None else F.current_date()
    if not add_date:
        date_lit = F.lit(None).cast("date")

    repo = with_record_id(repository)
    marked_flag = F.col("_mark").isNotNull() & (F.col("status") == "predicted")
    joined = repo.join(
        F.broadcast(marks.select("record_id", F.col("mark").alias("_mark"))),
        on="record_id",
        how="left",
    )

    is_unsure = F.col("_mark") == "unsure"
    to_manual = marked_flag & ~is_unsure

    pred_map = F.create_map(*[F.lit(x) for kv in MARK_TO_PREDICATE.items() for x in kv])
    status_map = F.create_map(*[F.lit(x) for kv in MARK_TO_STATUS.items() for x in kv])

    out = (
        joined.withColumn(
            "predicate_id",
            F.when(to_manual, F.coalesce(pred_map[F.col("_mark")], F.col("predicate_id"))).otherwise(
                F.col("predicate_id")
            ),
        )
        .withColumn(
            "predicate_modifier",
            F.when(marked_flag & (F.col("_mark") == "incorrect"), F.lit("Not")).otherwise(
                F.col("predicate_modifier")
            ),
        )
        .withColumn(
            "mapping_justification",
            F.when(to_manual, F.lit(MANUAL)).otherwise(F.col("mapping_justification")),
        )
        .withColumn(
            "author_id",
            F.when(to_manual, F.array(F.lit(author))).otherwise(F.col("author_id")),
        )
        .withColumn("mapping_date", F.when(to_manual, date_lit).otherwise(F.col("mapping_date")))
        .withColumn(
            "confidence", F.when(to_manual, F.lit(None).cast("double")).otherwise(F.col("confidence"))
        )
        .withColumn(
            "mapping_tool", F.when(to_manual, F.lit(None)).otherwise(F.col("mapping_tool"))
        )
        .withColumn(
            "mapping_tool_id", F.when(to_manual, F.lit(None)).otherwise(F.col("mapping_tool_id"))
        )
        .withColumn(
            "mapping_tool_version",
            F.when(to_manual, F.lit(None)).otherwise(F.col("mapping_tool_version")),
        )
        .withColumn(
            "reviewer_id",
            F.when(marked_flag & is_unsure, F.array(F.lit(author))).otherwise(F.col("reviewer_id")),
        )
        .withColumn(
            "review_date",
            F.when(marked_flag & is_unsure, date_lit).otherwise(F.col("review_date")),
        )
        .withColumn(
            "reviewer_agreement",
            F.when(marked_flag & is_unsure, F.lit(0.0)).otherwise(F.col("reviewer_agreement")),
        )
        .withColumn(
            "status",
            F.when(marked_flag, status_map[F.col("_mark")]).otherwise(F.col("status")),
        )
        .drop("_mark")
    )
    # Curated rows get a fresh content hash (identity tuple changed).
    return out.withColumn("record_id", record_hash())


class CurationSession:
    """A8 running curation counters around the mark/persist lifecycle.

    Mirrors the reference's controller counters: ``total_curated``
    increments per applied mark and never resets (base.py:40,72-74 — it
    feeds the remote-persist commit message), while ``count_unpersisted()``
    tracks curations not yet flushed and resets on ``persist()``
    (memory.py:118,125-136).

    Spark disposition: the counters are driver-side ints (curation volume
    is human-scale); the one distributed cost per batch is a broadcast
    left-semi count of marks that actually hit an eligible ``predicted``
    row — marks on non-predictions are no-ops and must not count, exactly
    like the reference's KeyError guard filtering the pop from
    ``_predictions``.
    """

    #: lineage checkpoint cadence: every N mark batches the accumulated
    #: apply_marks chain is cut with a localCheckpoint so per-batch work
    #: stays O(table), not O(table × batches-so-far).
    CHECKPOINT_EVERY = 8

    def __init__(self, repository: DataFrame) -> None:
        self.repository = with_record_id(repository)
        self.total_curated = 0
        self._unpersisted = 0
        self._batches = 0

    def mark(
        self,
        marks: DataFrame,
        *,
        author: str,
        today: datetime.date | None = None,
        add_date: bool = True,
    ) -> DataFrame:
        """Apply a batch of marks; returns (and retains) the new table."""
        # Count MARKS that hit an eligible predicted row — not matching
        # repository rows: duplicate record_ids in the repository must not
        # overcount vs the reference's per-mark increment (base.py:72-74
        # bumps once per curated mapping). The repository side stays the
        # join's streamed side (no shuffle of the big table — the marks
        # broadcast), and the distinct runs on the surviving ≤|marks| set.
        applied = (
            self.repository.filter(F.col("status") == "predicted")
            .join(
                F.broadcast(marks.select("record_id").distinct()),
                on="record_id",
                how="left_semi",
            )
            .select("record_id")
            .distinct()
            .count()
        )
        self.repository = apply_marks(
            self.repository, marks, author=author, today=today, add_date=add_date
        )
        self._batches += 1
        if self._batches % self.CHECKPOINT_EVERY == 0:
            self.repository = self.repository.localCheckpoint()
        self.total_curated += applied
        self._unpersisted += applied
        return self.repository

    def count_unpersisted(self) -> int:
        """Curations applied since the last ``persist()``."""
        return self._unpersisted

    def persist(self, path: str | None = None) -> int:
        """Flush: optionally write the table, reset the unpersisted
        counter (memory.py:129-136 clears ``curations``), return how many
        curations were flushed. ``total_curated`` is untouched."""
        flushed = self._unpersisted
        if path is not None:
            self.repository.write.mode("overwrite").parquet(path)
        self._unpersisted = 0
        return flushed
