"""Structured Streaming operators (SURVEY.md §2.9).

The reference has no streaming; its closest analogue is incremental
curation — rows buffered in memory then batch-persisted
(web/backends/memory.py:94-153). The Spark-native generalization: pages
arrive as a stream, each micro-batch runs the mention-detection stage and
MERGEs into the evidence/repository tables via ``foreachBatch`` (Iceberg
``MERGE INTO`` in production; parquet-append here). Watermarked tumbling
windows cover the late-data case for event-style inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["windowed_event_counts", "incremental_mention_stream"]


def windowed_event_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts — works on both batch and
    streaming frames (same plan, Catalyst dispatches)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return src.groupBy(F.window(ts_col, window).alias("win"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )


def incremental_mention_stream(
    pages_stream: DataFrame,
    labels: DataFrame,
    *,
    output_path: str,
    checkpoint_path: str,
    id_col: str = "url",
    text_col: str = "text",
):
    """Micro-batch mention detection: ``foreachBatch`` runs the same
    batch operator (annotate_mentions) on each increment and appends to
    the evidence table — the streaming form of pipeline stage 3.

    Returns the started StreamingQuery (caller awaits/stops it).
    """
    from sssom_curator_spark.operators.grounding import annotate_mentions

    def process(batch_df: DataFrame, batch_id: int) -> None:
        mentions = annotate_mentions(batch_df, labels, id_col=id_col, text_col=text_col)
        (
            mentions.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(output_path)
        )

    return (
        pages_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
