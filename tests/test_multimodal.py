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
