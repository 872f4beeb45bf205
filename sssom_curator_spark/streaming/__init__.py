"""Structured Streaming surface: incremental page ingest + curation."""

from sssom_curator_spark.streaming.incremental import (
    incremental_mention_stream,
    windowed_event_counts,
)

__all__ = ["incremental_mention_stream", "windowed_event_counts"]
