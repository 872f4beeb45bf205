"""Structured Streaming surface: micro-batch mention ingest + windows."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sssom_curator_spark.sources.fixtures import seed_labels
from sssom_curator_spark.sources.pages import generate_pages
from sssom_curator_spark.streaming.incremental import (
    incremental_mention_stream,
    windowed_event_counts,
)


class TestWindowedCounts:
    def test_batch_mode_hourly_windows(self, spark):
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        out = windowed_event_counts(ev)
        rows = out.collect()
        assert rows
        total = sum(r["n"] for r in rows)
        assert total == ev.count()


class TestIncrementalMentions:
    def test_stream_matches_batch(self, spark, tmp_path):
        from sssom_curator_spark.operators.grounding import annotate_mentions

        pages = generate_pages(spark, 120).select("url", "warc_ts", "text", "lang")
        src_dir = str(tmp_path / "src")
        pages.coalesce(2).write.parquet(src_dir)
        labels = seed_labels(spark)

        out_dir = str(tmp_path / "mentions")
        ckpt = str(tmp_path / "ckpt")
        stream = spark.readStream.schema(pages.schema).parquet(src_dir)
        q = incremental_mention_stream(
            stream, labels, output_path=out_dir, checkpoint_path=ckpt
        )
        q.awaitTermination(120)

        got = spark.read.parquet(out_dir).drop("batch_id")
        batch = annotate_mentions(
            spark.read.parquet(src_dir), labels, id_col="url", text_col="text"
        )
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))
        assert os.path.isdir(ckpt)
