"""Dedup family: planted near-duplicates, LSH vs exact agreement,
deterministic winners."""

from __future__ import annotations

from pyspark.sql import functions as F

from sssom_curator_spark.operators.dedup import (
    exact_dedup,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_duplicates,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while researchers study "
    "large scale data systems for web text processing"
)


def _docs(spark):
    rows = [
        ("d01", BASE),
        ("d02", BASE),  # exact dup of d01
        ("d03", BASE.replace("lazy", "sleepy")),  # near dup
        ("d04", "completely different content about ontology mappings and curies"),
        ("d05", "completely different content about ontology mappings and curies"),
        ("d06", "unrelated short text"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


class TestExactDedup:
    def test_deterministic_winner(self, spark):
        out = exact_dedup(_docs(spark), ["text"])
        kept = sorted(r["doc_id"] for r in out.collect())
        assert kept == ["d01", "d03", "d04", "d06"]

    def test_partition_invariance(self, spark):
        a = sorted(r["doc_id"] for r in exact_dedup(_docs(spark).coalesce(1), ["text"]).collect())
        b = sorted(
            r["doc_id"] for r in exact_dedup(_docs(spark).repartition(8), ["text"]).collect()
        )
        assert a == b


class TestMinHashLSH:
    def test_finds_planted_duplicates(self, spark):
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in minhash_near_duplicates(_docs(spark), jaccard_threshold=0.5).collect()
        }
        assert got[("d01", "d02")] == 1.0
        assert got[("d04", "d05")] == 1.0
        assert ("d01", "d03") in got  # near dup above 0.5
        assert all(a < b for a, b in got)

    def test_verified_subset_of_exact(self, spark):
        # every LSH-verified pair must appear in the exact jaccard pairs
        # with the identical score (LSH may MISS pairs, never invent them)
        lsh = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in minhash_near_duplicates(_docs(spark), jaccard_threshold=0.3).collect()
        }
        exact = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(_docs(spark), threshold=0.3).collect()
        }
        for pair, j in lsh.items():
            assert exact[pair] == j


class TestSimHash:
    def test_identical_docs_identical_signature(self, spark):
        sigs = {r["doc_id"]: r["simhash"] for r in simhash(_docs(spark)).collect()}
        assert sigs["d01"] == sigs["d02"]
        assert sigs["d04"] == sigs["d05"]
        assert sigs["d01"] != sigs["d04"]

    def test_near_duplicates_by_hamming(self, spark):
        pairs = {
            (r["doc_a"], r["doc_b"]) for r in simhash_near_duplicates(_docs(spark), max_hamming=10).collect()
        }
        assert ("d01", "d02") in pairs
        assert ("d04", "d05") in pairs

    def test_signature_is_partition_invariant(self, spark):
        one = {r["doc_id"]: r["simhash"] for r in simhash(_docs(spark).coalesce(1)).collect()}
        many = {r["doc_id"]: r["simhash"] for r in simhash(_docs(spark).repartition(6)).collect()}
        assert one == many
