"""Document deduplication family for training-data pipelines.

Not present in the reference (its dedup is exact-tuple ``drop_duplicates``
on write — constants.py:107, covered by
:func:`sssom_curator_spark.io.sssom_tsv.lint_frame`); these are the
web-corpus operators a 100 TB pipeline needs, built Spark-first:

- exact dedup: hash-groupBy keep-first (deterministic winner);
- MinHash + LSH: shingle → k min-hashes → band → bucket self-join →
  verified Jaccard. Hashing uses ``md5`` hex *strings* ordered
  lexicographically — portable across engines, so the DuckDB oracle can
  replay the exact pipeline;
- SimHash: 64-bit signatures from token hashes in an Arrow-batched pandas
  UDF, near-dup candidates via bit-chunk banding + ``bit_count`` verify;
- n-gram Jaccard: exact set similarity via explode + equi-join (the
  verification path, and an operator in its own right).

Scale notes: every self-join here is an equi-join on a bucket/band key —
never a cross join; band keys are md5s, so bucket skew only occurs for
genuinely repeated content (which is exactly what AQE skew-split handles);
explode factors are bounded (k hashes, b bands, n-per-shingle).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sssom_curator_spark.functions.text_norm import norm_text_col
from sssom_curator_spark.operators.textstats import stable_round

__all__ = [
    "exact_dedup",
    "shingles",
    "minhash_signature",
    "minhash_near_duplicates",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_near_duplicates",
]


def exact_dedup(df: DataFrame, key_cols: list[str], *, id_col: str = "doc_id") -> DataFrame:
    """Exact dedup with a deterministic winner: min(id) per content key.

    ``dropDuplicates`` keeps an arbitrary row; at scale (and for oracle
    parity) the winner must be stable, so this is a groupBy + semi-join
    back — one shuffle on the content key, same cost as dropDuplicates.
    """
    winners = df.groupBy(*key_cols).agg(F.min(id_col).alias(id_col))
    return df.join(winners, on=[*key_cols, id_col], how="left_semi")


def shingles(df: DataFrame, *, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct token n-gram shingles per document (normalized text)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.split(norm_text_col(text_col), " ").alias("toks")
    )
    positions = F.when(
        F.size("toks") >= n, F.sequence(F.lit(1), F.size("toks") - (n - 1))
    ).otherwise(F.array().cast("array<int>"))

    def make(pos):
        return F.concat_ws(" ", *[F.get(F.col("toks"), pos - 1 + k) for k in range(n)])

    return (
        toks.select("doc_id", F.explode(F.transform(positions, make)).alias("shingle"))
        .distinct()
    )


def minhash_signature(
    shingle_df: DataFrame, *, num_hashes: int = 16
) -> DataFrame:
    """k-permutation MinHash over md5 hex strings (portable, deterministic).

    Hash family i = ``md5(i || '|' || shingle)``; the minimum hex string
    per document per family is the signature component. One shuffle
    (groupBy doc) computes all k minima as k aggregates — no explode by k.
    """
    aggs = [
        F.min(F.md5(F.concat_ws("|", F.lit(str(i)), F.col("shingle")))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return shingle_df.groupBy("doc_id").agg(*aggs)


def minhash_near_duplicates(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    jaccard_threshold: float = 0.5,
    verify: bool = True,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle → signature → band →
    bucket self-join → (optional) exact-Jaccard verification.

    Output: ``(doc_a, doc_b, jaccard)`` with doc_a < doc_b. Candidate
    generation is an equi-self-join on (band_index, band_key); verification
    joins the shingle sets of candidate pairs only (a semi-join-shaped
    explosion bounded by candidate count, not corpus²).
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sh = shingles(df, id_col=id_col, text_col=text_col, n=shingle_n).persist()
    sig = minhash_signature(sh, num_hashes=num_hashes)

    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws("|", *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)])
            ).alias("key"),
        )
        for b in range(bands)
    ]
    banded = sig.select("doc_id", F.explode(F.array(*band_cols)).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.key") == F.col("r.key"),
                F.col("l.doc_id") < F.col("r.doc_id"),
            ],
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
    if not verify:
        return cand
    verified = _jaccard_for_pairs(cand, sh)
    sh.unpersist()
    return verified.filter(F.col("jaccard") >= jaccard_threshold)


def _jaccard_for_pairs(pairs: DataFrame, sh: DataFrame) -> DataFrame:
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    # intersection via join on (pair, shingle)
    a_side = pairs.join(sh.withColumnRenamed("doc_id", "doc_a"), on="doc_a")
    b_side = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingle"))
    inter = (
        a_side.join(b_side, on=["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        pairs.join(inter, on=["doc_a", "doc_b"], how="left")
        .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), on="doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), on="doc_b")
        .select(
            "doc_a",
            "doc_b",
            stable_round(
                F.coalesce(F.col("inter"), F.lit(0))
                / (F.col("na") + F.col("nb") - F.coalesce(F.col("inter"), F.lit(0))),
                6,
            ).alias("jaccard"),
        )
    )
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing ≥1 shingle.

    The shingle equi-join prunes the pair space to co-occurring documents
    (inverted-index join) — the exact-but-heavier sibling of MinHash-LSH.
    """
    sh = shingles(df, id_col=id_col, text_col=text_col, n=shingle_n).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), on="doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), on="doc_b")
        .select(
            "doc_a",
            "doc_b",
            stable_round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    sh.unpersist()
    return out


_SIMHASH_BITS = 64


def simhash(
    df: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash signature per document, Arrow-batched.

    Token hashes come from the first 16 hex chars of md5 (stable across
    runs and engines); the signature bit i is the sign of the sum of
    ±1 votes of all token hashes at bit i — computed as one numpy
    matrix op per Arrow batch, no per-row Python at the Spark API level.
    """
    out_schema = T.StructType(
        [T.StructField("doc_id", T.StringType()), T.StructField("simhash", T.LongType())]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for batch in batches:
            ids, sigs = [], []
            for doc_id, text in zip(batch[id_col], batch[text_col]):
                toks = ("" if text is None else str(text)).lower().split()
                if not toks:
                    ids.append(str(doc_id))
                    sigs.append(0)
                    continue
                hs = np.array(
                    [
                        int(hashlib.md5(t.encode("utf-8")).hexdigest()[:16], 16)
                        for t in set(toks)
                    ],
                    dtype=np.uint64,
                )
                bits = (hs[:, None] >> np.arange(_SIMHASH_BITS, dtype=np.uint64)) & np.uint64(1)
                votes = np.where(bits == 1, 1, -1).sum(axis=0)
                sig = np.uint64(0)
                for i in np.nonzero(votes > 0)[0]:
                    sig |= np.uint64(1) << np.uint64(i)
                ids.append(str(doc_id))
                sigs.append(int(np.int64(sig)))  # two's-complement into LongType
            yield pd.DataFrame({"doc_id": ids, "simhash": sigs})

    return df.select(id_col, text_col).mapInPandas(compute, schema=out_schema)


def simhash_near_duplicates(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    chunks: int = 4,
) -> DataFrame:
    """Near-dups by SimHash: banding on 16-bit chunks (pigeonhole: hamming
    ≤ chunks-1 ⇒ some chunk equal), verified with ``bit_count(a XOR b)``."""
    sig = simhash(df, id_col=id_col, text_col=text_col).persist()
    width = _SIMHASH_BITS // chunks
    chunk_cols = [
        F.struct(
            F.lit(i).alias("chunk"),
            F.shiftrightunsigned(F.col("simhash"), i * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("key"),
        )
        for i in range(chunks)
    ]
    banded = sig.select("doc_id", "simhash", F.explode(F.array(*chunk_cols)).alias("c")).select(
        "doc_id", "simhash", F.col("c.chunk").alias("chunk"), F.col("c.key").alias("key")
    )
    l, r = banded.alias("l"), banded.alias("r")
    cand = (
        l.join(
            r,
            on=[
                F.col("l.chunk") == F.col("r.chunk"),
                F.col("l.key") == F.col("r.key"),
                F.col("l.doc_id") < F.col("r.doc_id"),
            ],
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    result = cand.localCheckpoint()
    sig.unpersist()
    return result
