"""Multimodal column plumbing: opaque binary media + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as opaque
``binary`` columns with typed metadata structs, decoded lazily inside
Arrow-batched UDFs. The decode libraries (PIL/ffmpeg/librosa) are NOT in
this container, so the *decode kernels* are stubbed — a deterministic fake
header format stands in — while everything Spark-side is real and tested:
schema, partition-preserving ``mapInPandas`` plumbing, batch shapes,
metadata extraction, and frame-sampling row explosion.

Fake media format (deterministic, used by the generator and tests):
``b"FAKEIMG" | 1-byte version | 2-byte BE width | 2-byte BE height | payload``.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "generate_fake_images",
    "image_metadata",
    "sample_frames",
    "decode_image",
]

MEDIA_MAGIC = b"FAKEIMG"

#: media table: id + opaque payload + typed metadata struct.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)


def generate_fake_images(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic fake image table (column-expression generator)."""
    base = spark.range(n)
    w = (F.pmod(F.abs(F.xxhash64("id", F.lit(1))), F.lit(320)) + 16).cast("int")
    h = (F.pmod(F.abs(F.xxhash64("id", F.lit(2))), F.lit(240)) + 16).cast("int")
    # header: magic + version(1) + width(2,BE) + height(2,BE)
    header = F.concat(
        F.lit(MEDIA_MAGIC),
        F.lit(bytes([1])),
        F.expr("unhex(lpad(hex(cast(pmod(abs(xxhash64(id, 1)), 320) + 16 as int)), 4, '0'))"),
        F.expr("unhex(lpad(hex(cast(pmod(abs(xxhash64(id, 2)), 240) + 16 as int)), 4, '0'))"),
        F.md5(F.col("id").cast("string")).cast("binary"),
    )
    return base.select(
        F.concat(F.lit("img-"), F.col("id").cast("string")).alias("media_id"),
        F.lit("image/fake").alias("media_type"),
        header.alias("payload"),
        F.struct(
            w.alias("width"), h.alias("height"), F.length(header).cast("long").alias("n_bytes")
        ).alias("meta"),
    )


def decode_image(payload: bytes):
    """Decode kernel STUB.

    The real implementation would be ``PIL.Image.open(io.BytesIO(payload))``
    — PIL is not available in this environment. The fake-format header is
    parsed for real so the plumbing (shapes, schemas, batching) is
    exercised end-to-end; requesting pixel data raises.
    """
    if payload is None or not bytes(payload).startswith(MEDIA_MAGIC):
        raise ValueError("not a FAKEIMG payload")
    version = payload[len(MEDIA_MAGIC)]
    width, height = struct.unpack(">HH", bytes(payload[len(MEDIA_MAGIC) + 1 : len(MEDIA_MAGIC) + 5]))
    return {"version": version, "width": width, "height": height}


_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("version", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("aspect", T.DoubleType()),
    ]
)


def image_metadata(media: DataFrame) -> DataFrame:
    """Header-decode each payload in Arrow batches (real plumbing, stub
    kernel): one output row per media row.

    The fixed-width header is parsed fully vectorized per batch — the
    magic/version/width/height bytes of every payload are stacked into one
    uint8 matrix and decoded with numpy arithmetic, no per-row Python loop
    (a real decode would be a per-item C call, but the plumbing should
    model the vectorized shape regardless).
    """
    import numpy as np

    hdr_len = len(MEDIA_MAGIC) + 5  # magic + version(1) + width(2) + height(2)
    magic = np.frombuffer(MEDIA_MAGIC, dtype=np.uint8)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if batch.empty:
                yield pd.DataFrame(
                    {"media_id": [], "version": [], "width": [], "height": [], "aspect": []}
                )
                continue
            payloads = batch["payload"]
            # fixed-width header slice per row → one (n, hdr_len) uint8 matrix
            heads = np.zeros((len(payloads), hdr_len), dtype=np.uint8)
            ok = np.zeros(len(payloads), dtype=bool)
            for i, p in enumerate(payloads):  # byte-slice copy only; all
                if p is not None and len(p) >= hdr_len:  # parsing is matrix math
                    heads[i] = np.frombuffer(bytes(p[:hdr_len]), dtype=np.uint8)
                    ok[i] = True
            ok &= (heads[:, : len(magic)] == magic).all(axis=1)
            # zero-height headers are rejected like bad magic — aspect
            # below divides by height, and a 0 would emit aspect=inf
            # instead of skipping the malformed row. (Truncated payloads
            # shorter than the header are likewise silently skipped via
            # the length check above — malformed media rows never abort
            # the scan, they just don't produce metadata rows.)
            ok &= (
                heads[:, len(magic) + 3].astype(np.int32) * 256
                + heads[:, len(magic) + 4].astype(np.int32)
            ) > 0
            h = heads[ok]
            version = h[:, len(magic)].astype(np.int32)
            width = (
                h[:, len(magic) + 1].astype(np.int32) * 256
                + h[:, len(magic) + 2].astype(np.int32)
            )
            height = (
                h[:, len(magic) + 3].astype(np.int32) * 256
                + h[:, len(magic) + 4].astype(np.int32)
            )
            yield pd.DataFrame(
                {
                    "media_id": batch["media_id"].to_numpy()[ok],
                    "version": version,
                    "width": width,
                    "height": height,
                    "aspect": np.round(width / height, 4),
                }
            )

    return media.select("media_id", "payload").mapInPandas(decode, schema=_META_SCHEMA)


def sample_frames(media: DataFrame, *, every_n: int = 10, max_frames: int = 5) -> DataFrame:
    """Frame-sampling row explosion (video → frame rows), pure column
    algebra: deterministic frame indices from metadata; the per-frame
    decode is the same stubbed kernel."""
    n_frames = F.least(
        F.lit(max_frames), F.greatest((F.col("meta.n_bytes") / every_n).cast("int"), F.lit(1))
    )
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_index"),
    ).withColumn("frame_offset", F.col("frame_index") * every_n)
