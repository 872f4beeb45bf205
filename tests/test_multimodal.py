"""Multimodal plumbing: real Spark-side schema/batching, stubbed kernels."""

from __future__ import annotations

import pytest

from sssom_curator_spark.operators.multimodal import (
    decode_image,
    generate_fake_images,
    image_metadata,
    sample_frames,
)


class TestFakeImages:
    def test_generator_schema_and_determinism(self, spark):
        a = generate_fake_images(spark, 50).collect()
        b = generate_fake_images(spark, 50).collect()
        assert sorted(map(str, a)) == sorted(map(str, b))
        assert all(bytes(r["payload"]).startswith(b"FAKEIMG") for r in a)
        assert all(r["meta"]["width"] >= 16 for r in a)

    def test_metadata_roundtrip(self, spark):
        media = generate_fake_images(spark, 40)
        meta = {r["media_id"]: r for r in image_metadata(media).collect()}
        for r in media.collect():
            m = meta[r["media_id"]]
            assert m["width"] == r["meta"]["width"]
            assert m["height"] == r["meta"]["height"]
            assert m["version"] == 1
            assert m["aspect"] == round(m["width"] / m["height"], 4)

    def test_decode_rejects_garbage(self):
        with pytest.raises(ValueError):
            decode_image(b"NOTANIMG")

    def test_frame_sampling_explodes_rows(self, spark):
        media = generate_fake_images(spark, 10)
        frames = sample_frames(media, every_n=10, max_frames=3)
        rows = frames.collect()
        assert len(rows) > 10  # exploded
        assert all(r["frame_offset"] == r["frame_index"] * 10 for r in rows)

    def test_metadata_partition_invariance(self, spark):
        media = generate_fake_images(spark, 30)
        one = sorted(map(tuple, image_metadata(media.coalesce(1)).collect()))
        many = sorted(map(tuple, image_metadata(media.repartition(8)).collect()))
        assert one == many


class TestMalformedHeaders:
    def test_zero_height_and_truncated_rows_skipped(self, spark):
        """Zero-height headers and truncated payloads are rejected like
        bad magic — no aspect=inf rows, no struct errors, scan completes."""
        from sssom_curator_spark.operators.multimodal import MEDIA_MAGIC

        good = MEDIA_MAGIC + bytes([1, 0, 64, 0, 32])  # 64x32
        zero_h = MEDIA_MAGIC + bytes([1, 0, 64, 0, 0])  # height == 0
        short = MEDIA_MAGIC[:3]  # truncated below header length
        bad_magic = b"XXXXXXX" + bytes([1, 0, 8, 0, 8])
        media = spark.createDataFrame(
            [("ok", good), ("zh", zero_h), ("tr", short), ("bm", bad_magic), ("nl", None)],
            "media_id string, payload binary",
        )
        rows = {r["media_id"]: r for r in image_metadata(media).collect()}
        assert set(rows) == {"ok"}
        assert rows["ok"]["width"] == 64 and rows["ok"]["height"] == 32
        assert rows["ok"]["aspect"] == 2.0
