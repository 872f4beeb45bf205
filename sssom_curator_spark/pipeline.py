"""End-to-end KG construction over web pages (the north-rule pipeline).

Stages (each instrumented with per-partition metrics and snapshot-
checkpointed when a :class:`SnapshotStore` is supplied):

1. **filter** — language-ID + quality gate (pure codegen; predicate
   pushdown applies before the binary ``html`` column is ever read).
2. **extract** — deterministic html→text pandas UDF; optional parity audit
   against the stored ``text`` (byte-identical-per-url invariant).
3. **mention** — Aho–Corasick mention detection against the broadcast
   lexical index (iterator pandas UDF, init-once per worker).
4. **evidence** — per (surface, entity) corpus evidence: distinct-doc
   counts. The groupBy key includes the surface (hub labels are the skew
   case; AQE skew-split plus the mention explode's natural partitioning
   handle it — the aggregation is partial/map-side combined).
5. **predict** — cross-namespace candidate mappings from the label index
   (all-by-all J3), confidence = logistic score boosted by corpus
   evidence, cutoff 0.65 (reference default, predict/embedding.py:53-54).
6. **exclude** — anti-join stack: curated (J5), existing xrefs (J6),
   already-connected components (J7).
7. **canonicalize** — connected components over accepted exactMatch edges;
   every CURIE maps to its component representative.

Outputs: ``mappings`` (SSSOM prediction table), ``components``
(canonicalization table), ``annotations`` (doc→entity evidence), and the
metrics frame.
"""

from __future__ import annotations

import datetime
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sssom_curator_spark.checkpoint import SnapshotStore
from sssom_curator_spark.curation.state import with_record_id
from sssom_curator_spark.extract import with_extracted_text
from sssom_curator_spark.graph.components import connected_components
from sssom_curator_spark.lineage import MetricsRegistry
from sssom_curator_spark.operators.grounding import all_by_all, annotate_mentions
from sssom_curator_spark.operators.relational import (
    exclude_curated,
    exclude_existing_xrefs,
)
from sssom_curator_spark.operators.textstats import langid_heuristic, quality_score
from sssom_curator_spark.schema import MAPPING_SCHEMA

__all__ = ["KGConfig", "build_kg"]


@dataclass
class KGConfig:
    languages: tuple[str, ...] = ("en",)
    min_quality: float = 0.3
    confidence_cutoff: float = 0.65
    mapping_tool: str = "sssom-curator-spark"
    mapping_tool_id: str = "wikidata:Q138902949"
    mapping_tool_version: str = "0.1.0"
    mapping_date: datetime.date = datetime.date(2026, 8, 16)
    enforce_extraction_parity: bool = False


def _as_mapping_rows(df: DataFrame, cfg: KGConfig) -> DataFrame:
    """Project prediction edges into the full MAPPING_SCHEMA column set."""
    out = df
    for field in MAPPING_SCHEMA.fields:
        if field.name not in out.columns:
            out = out.withColumn(field.name, F.lit(None).cast(field.dataType))
    out = (
        out.withColumn("mapping_tool", F.lit(cfg.mapping_tool))
        .withColumn("mapping_tool_id", F.lit(cfg.mapping_tool_id))
        .withColumn("mapping_tool_version", F.lit(cfg.mapping_tool_version))
        .withColumn("mapping_date", F.lit(cfg.mapping_date))
        .withColumn("status", F.lit("predicted"))
    )
    return with_record_id(out.select(*[f.name for f in MAPPING_SCHEMA.fields]))


def build_kg(
    spark: SparkSession,
    pages: DataFrame,
    labels: DataFrame,
    *,
    xrefs: DataFrame | None = None,
    curated: DataFrame | None = None,
    config: KGConfig | None = None,
    snapshots: SnapshotStore | None = None,
    metrics: MetricsRegistry | None = None,
    materialize: bool | None = None,
) -> dict[str, DataFrame]:
    """Build the KG-construction DAG over ``pages``.

    ``materialize`` picks the execution shape:

    - ``True`` (default): every stage is materialized exactly once
      (snapshot write when a store is present, persist+count otherwise)
      with wall-clock + per-partition lineage recorded — the resumable
      production mode (north rule: checkpoints, lineage, metrics).
    - ``False``: stages compose lazily and Catalyst fuses
      filter → extract → mention into a single pass over ``pages`` (one
      scan, map-side pipelined; only the final ``mappings`` frame is
      persisted because two outputs consume it). This is the throughput
      mode — at 100 TB you do not cache intermediate page-sized frames.
    """
    cfg = config or KGConfig()
    reg = metrics or MetricsRegistry(spark)
    eager = materialize if materialize is not None else True

    def stage(name: str, metric_name: str, compute):
        t0 = time.monotonic()
        if snapshots is not None:
            frame, resumed = snapshots.resume_or_compute(name, compute)
            wall = None if resumed else time.monotonic() - t0
            reg.register_stage(metric_name, frame, wall_sec=wall)
            return frame
        if not eager:
            frame = compute()
            reg.register_stage(metric_name, frame)
            return frame
        frame = compute().persist()
        rows = frame.count()
        reg.register_stage(
            metric_name, frame, wall_sec=time.monotonic() - t0, rows=rows
        )
        return frame

    # 1. filter ------------------------------------------------------------
    def compute_filtered() -> DataFrame:
        scored = quality_score(langid_heuristic(pages))
        kept = scored.filter(
            F.col("lang_pred").isin(list(cfg.languages))
            & (F.col("quality") >= cfg.min_quality)
        ).select("url", "warc_ts", "html", "text", "lang")
        return kept

    filtered = stage("filtered_pages", "filter", compute_filtered)

    # 2. extract -----------------------------------------------------------
    def compute_extracted() -> DataFrame:
        ext = with_extracted_text(filtered)
        if cfg.enforce_extraction_parity:
            ext = ext.filter(F.col("extracted_text").eqNullSafe(F.col("text")))
        return ext.select("url", "warc_ts", "extracted_text", "lang")

    extracted = stage("extracted_pages", "extract", compute_extracted)

    # 3. mention -----------------------------------------------------------
    def compute_mentions() -> DataFrame:
        m = annotate_mentions(
            extracted, labels, id_col="url", text_col="extracted_text"
        )
        return m

    mentions = stage("mentions", "mention", compute_mentions)

    # 4. evidence ----------------------------------------------------------
    def compute_evidence() -> DataFrame:
        ev = mentions.groupBy("surface", "object_id").agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_mentions"),
        )
        return ev

    evidence = stage("evidence", "evidence", compute_evidence)

    # 5. predict -----------------------------------------------------------
    def compute_predictions() -> DataFrame:
        cand = all_by_all(labels)
        surface_evidence = evidence.groupBy("surface").agg(
            F.sum("n_docs").alias("surface_docs")
        )
        boosted = cand.join(
            F.broadcast(surface_evidence),
            on=F.lower(cand["subject_label"]).eqNullSafe(F.col("surface"))
            | F.lower(cand["object_label"]).eqNullSafe(F.col("surface")),
            how="left",
        )
        # evidence boost saturates: conf' = conf + (1-conf) * min(docs/20, .5)
        boost = F.least(F.coalesce(F.col("surface_docs"), F.lit(0)) / 20.0, F.lit(0.5))
        scored = boosted.withColumn(
            "confidence",
            F.round(F.col("confidence") + (1.0 - F.col("confidence")) * boost, 3),
        ).drop("surface", "surface_docs")
        kept = scored.filter(F.col("confidence") >= cfg.confidence_cutoff)
        return _as_mapping_rows(kept, cfg)

    predictions = stage("predictions", "predict", compute_predictions)

    # 6. exclude -----------------------------------------------------------
    def compute_excluded() -> DataFrame:
        out = predictions
        if curated is not None:
            out = exclude_curated(out, curated)
        if xrefs is not None:
            out = exclude_existing_xrefs(out, xrefs)
        return out

    accepted = stage("accepted_predictions", "exclude", compute_excluded)
    if not eager and snapshots is None:
        # the one frame two outputs consume (mappings sink + CC edges); it
        # is prediction-sized (small), never page-sized. Materialize it
        # FULLY here: a lazy persist populates the cache only for the
        # partitions the first consumer touches, and the connected-
        # components small-graph probe is a limit().collect() — without
        # the count() the heavy extract/mention chain would re-execute for
        # the untouched partitions on the next consumer.
        accepted = accepted.persist()
        accepted.count()

    # 7. canonicalize ------------------------------------------------------
    def compute_components() -> DataFrame:
        edges = accepted.filter(F.col("predicate_id") == "skos:exactMatch").select(
            F.col("subject_id").alias("src"), F.col("object_id").alias("dst")
        )
        return connected_components(edges)

    components = stage("components", "canonicalize", compute_components)

    return {
        "filtered": filtered,
        "extracted": extracted,
        "mentions": mentions,
        "evidence": evidence,
        "mappings": accepted,
        "components": components,
        "metrics": reg.frame(),
        "_registry": reg,  # callers can pull fresh metrics after actions
    }
