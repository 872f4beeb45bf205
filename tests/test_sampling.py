"""Deterministic sampling / split assignment (operators/sampling.py)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from tests.test_functions import get_cached_spark

    return get_cached_spark()


def _docs(spark, n=2000):
    return spark.range(n).withColumnRenamed("id", "doc_id")


class TestSplitAssign:
    def test_fractions_and_determinism(self, spark):
        from sssom_curator_spark.operators.sampling import split_assign

        out = split_assign(_docs(spark), id_col="doc_id")
        counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert set(counts) == {"train", "val", "test"}
        assert abs(counts["train"] / 2000 - 0.9) < 0.03
        # partition-invariant, rerun-stable assignment per id
        a = {r["doc_id"]: r["split"] for r in out.collect()}
        b = {
            r["doc_id"]: r["split"]
            for r in split_assign(_docs(spark).repartition(13), id_col="doc_id").collect()
        }
        assert a == b

    def test_weights_normalized_and_order_respected(self, spark):
        from sssom_curator_spark.operators.sampling import split_assign

        out = split_assign(
            _docs(spark, 1000), id_col="doc_id", weights={"a": 3, "b": 1}
        )
        counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert abs(counts["a"] / 1000 - 0.75) < 0.05

    def test_rejects_degenerate(self, spark):
        from sssom_curator_spark.operators.sampling import split_assign

        with pytest.raises(ValueError):
            split_assign(_docs(spark, 10), id_col="doc_id", weights={"only": 1.0})


class TestDeterministicSample:
    def test_nested_and_disjoint_salts(self, spark):
        from sssom_curator_spark.operators.sampling import deterministic_sample

        docs = _docs(spark)
        s10 = {r["doc_id"] for r in deterministic_sample(docs, 0.1, id_col="doc_id").collect()}
        s20 = {r["doc_id"] for r in deterministic_sample(docs, 0.2, id_col="doc_id").collect()}
        assert s10 <= s20  # same salt => nested
        assert abs(len(s20) / 2000 - 0.2) < 0.04
        other = {
            r["doc_id"]
            for r in deterministic_sample(docs, 0.2, id_col="doc_id", salt="v2").collect()
        }
        assert other != s20  # different salt => independent selection

    def test_threshold_bounds(self):
        from sssom_curator_spark.operators.sampling import hex_threshold

        assert hex_threshold(0.0) == "00000000"
        # 1.0 -> "g": above every 8-hex key, so keep-all keeps ALL (a
        # clamped "ffffffff" under strict < dropped its own hash value)
        assert hex_threshold(1.0) == "g"
        assert hex_threshold(0.5) == "80000000"
        with pytest.raises(ValueError):
            hex_threshold(1.5)


class TestStratifiedSample:
    def test_per_stratum_fractions(self, spark):
        from sssom_curator_spark.operators.sampling import stratified_sample

        docs = _docs(spark, 3000).withColumn(
            "lang",
            F.when(F.col("doc_id") % 3 == 0, F.lit("en"))
            .when(F.col("doc_id") % 3 == 1, F.lit("de"))
            .otherwise(F.lit(None)),
        )
        kept = stratified_sample(
            docs, {"en": 0.8, "de": 0.2}, strata_col="lang", id_col="doc_id"
        )
        counts = {
            r["lang"]: r["n"]
            for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert abs(counts["en"] / 1000 - 0.8) < 0.05
        assert abs(counts["de"] / 1000 - 0.2) < 0.05
        # unmapped strata (here: NULL lang) keep default_fraction = 0.0
        assert None not in counts

    def test_default_fraction_and_nesting(self, spark):
        from sssom_curator_spark.operators.sampling import stratified_sample

        docs = _docs(spark, 1000).withColumn("lang", F.lit("xx"))
        few = {
            r["doc_id"]
            for r in stratified_sample(
                docs, {}, strata_col="lang", id_col="doc_id", default_fraction=0.1
            ).collect()
        }
        more = {
            r["doc_id"]
            for r in stratified_sample(
                docs, {}, strata_col="lang", id_col="doc_id", default_fraction=0.3
            ).collect()
        }
        assert few <= more and abs(len(more) / 1000 - 0.3) < 0.05


class TestPackSequences:
    def _packed(self, spark, n=200, budget=100):
        from sssom_curator_spark.operators.sampling import pack_sequences

        docs = _docs(spark, n).withColumn("n_tokens", F.col("doc_id") % 37 + 1)
        return pack_sequences(docs, budget=budget)

    def test_layout_is_valid_packing(self, spark):
        out = self._packed(spark).collect()
        # every offset is inside the budget, seq ids are bucket-qualified
        for r in out:
            assert 0 <= r["offset"] < 100
            assert r["seq_id"].startswith(r["bucket"] + "-")
        # within a bucket, offsets follow the exclusive running sum: the
        # doc stream re-packs exactly (verified against a python replay)
        import hashlib

        by_bucket: dict = {}
        for r in sorted(out, key=lambda r: r["doc_id"]):
            assert (
                hashlib.md5(f"pack|{r['doc_id']}".encode()).hexdigest()[:1]
                == r["bucket"]
            )
            cum = by_bucket.get(r["bucket"], 0)
            assert r["seq_id"] == f"{r['bucket']}-{cum // 100}"
            assert r["offset"] == cum % 100
            by_bucket[r["bucket"]] = cum + (r["doc_id"] % 37 + 1)

    def test_partition_invariant(self, spark):
        from sssom_curator_spark.operators.sampling import pack_sequences

        docs = _docs(spark, 500).withColumn("n_tokens", F.col("doc_id") % 19 + 1)
        a = sorted(map(tuple, pack_sequences(docs, budget=64).collect()))
        b = sorted(map(tuple, pack_sequences(docs.repartition(11), budget=64).collect()))
        assert a == b

    def test_rejects_nonpositive_budget(self, spark):
        from sssom_curator_spark.operators.sampling import pack_sequences

        with pytest.raises(ValueError):
            pack_sequences(_docs(spark, 5).withColumn("n_tokens", F.lit(1)), budget=0)


class TestMixtureWeights:
    def test_binding_group_and_rates(self, spark):
        """en 1000 / de 300 / es 200 chars at 50/30/20 targets: de binds
        (300/0.3 = 1000 is the smallest size/share), so kept = 500/300/200
        and rates = 0.5/1.0/1.0; fr (absent from targets) is omitted."""
        import pandas as pd

        from sssom_curator_spark.operators.sampling import mixture_weights

        stats = spark.createDataFrame(
            pd.DataFrame(
                {"domain": ["en", "de", "es", "fr"], "n_tokens": [1000, 300, 200, 999]}
            )
        )
        rows = {
            r["domain"]: r
            for r in mixture_weights(
                stats, {"en": 0.5, "de": 0.3, "es": 0.2}
            ).collect()
        }
        assert set(rows) == {"en", "de", "es"}
        assert rows["de"]["keep_rate"] == 1.0 and rows["es"]["keep_rate"] == 1.0
        assert abs(rows["en"]["keep_rate"] - 0.5) < 1e-9
        assert [rows[g]["kept_size"] for g in ("en", "de", "es")] == [500, 300, 200]
        # shares of kept volume hit the target mixture exactly
        total = sum(r["kept_size"] for r in rows.values())
        assert [round(rows[g]["kept_size"] / total, 6) for g in ("en", "de", "es")] == [
            0.5, 0.3, 0.2,
        ]
        # no rate ever exceeds 1 (downsample-only contract)
        assert all(r["keep_rate"] <= 1.0 for r in rows.values())

    def test_rejects_bad_targets(self, spark):
        import pandas as pd
        import pytest

        from sssom_curator_spark.operators.sampling import mixture_weights

        stats = spark.createDataFrame(pd.DataFrame({"domain": ["a"], "n_tokens": [1]}))
        with pytest.raises(ValueError):
            mixture_weights(stats, {"a": -0.1, "b": 0.2})
        with pytest.raises(ValueError):
            mixture_weights(stats, {"a": 0.0})


class TestReviewRegressionsR5:
    def test_fraction_one_keeps_every_row(self, spark):
        from sssom_curator_spark.operators.sampling import (
            deterministic_sample,
            hex_threshold,
            stratified_sample,
        )

        assert hex_threshold(1.0) == "g"  # compares above every hex key
        docs = spark.range(0, 1000).selectExpr("cast(id as string) doc_id",
                                               "'books' lang")
        assert deterministic_sample(docs, 1.0, id_col="doc_id").count() == 1000
        kept = stratified_sample(docs, {"books": 1.0}, strata_col="lang",
                                 id_col="doc_id")
        assert kept.count() == 1000

    def test_binding_group_rate_is_exactly_one(self, spark):
        """(size/t)*t/size dips below 1.0 in floats; the nearest-quantize
        must land the binding group's keep_rate on exactly 1.0."""
        import pandas as pd

        from sssom_curator_spark.operators.sampling import mixture_weights

        stats = spark.createDataFrame(
            pd.DataFrame({"domain": ["a", "b"], "n_tokens": [3, 1000]})
        )
        rows = {r["domain"]: r for r in
                mixture_weights(stats, {"a": 0.3, "b": 0.7}).collect()}
        assert rows["a"]["keep_rate"] == 1.0
        assert rows["a"]["kept_size"] == 3


class TestChunkDocuments:
    @staticmethod
    def _oracle(text, max_tokens, overlap):
        toks = (text or "").split()
        stride = max_tokens - overlap
        out = []
        if not toks:
            return out
        n_chunks = 1 if len(toks) <= max_tokens else 1 + -(-(len(toks) - max_tokens) // stride)
        for i in range(n_chunks):
            piece = toks[i * stride : i * stride + max_tokens]
            out.append((i, len(piece), " ".join(piece)))
        return out

    def test_matches_python_oracle(self, spark):
        from sssom_curator_spark.operators.sampling import chunk_documents

        texts = {
            1: " ".join(f"w{i}" for i in range(25)),   # multi-chunk
            2: "Short Doc",                            # single chunk, case kept
            3: "",                                     # no chunks
            4: None,                                   # no chunks
            5: " ".join(f"x{i}" for i in range(10)),   # exactly max_tokens
        }
        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
        )
        got = {}
        for r in chunk_documents(docs, max_tokens=10, overlap=3).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["chunk_id"], r["n_chunk_tokens"], r["chunk_text"])
            )
        for d, t in texts.items():
            assert sorted(got.get(d, [])) == self._oracle(t, 10, 3), d
        # overlap property: chunk k's tail == chunk k+1's head
        c = sorted(got[1])
        assert c[0][2].split()[-3:] == c[1][2].split()[:3]

    def test_validation(self, spark):
        from sssom_curator_spark.operators.sampling import chunk_documents

        docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["a"]}))
        with pytest.raises(ValueError):
            chunk_documents(docs, max_tokens=5, overlap=5)
        with pytest.raises(ValueError):
            chunk_documents(docs, max_tokens=5, overlap=-1)


class TestGroupTopkSample:
    def test_exact_k_deterministic(self, spark):
        import hashlib

        from sssom_curator_spark.operators.sampling import group_topk_sample

        rows = [(i, f"g{i % 3}") for i in range(50)]
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "grp"])
        )
        got = group_topk_sample(df, group_cols=["grp"], id_col="doc_id", k=4).collect()
        by_grp = {}
        for r in got:
            by_grp.setdefault(r["grp"], set()).add(r["doc_id"])
        # python oracle: the 4 smallest salted hashes per group
        want = {}
        for i, g in rows:
            h = hashlib.md5(f"gk|{i}".encode()).hexdigest()
            want.setdefault(g, []).append((h, i))
        for g, hs in want.items():
            expect = {i for _, i in sorted(hs)[:4]}
            assert by_grp[g] == expect, g
        # partition-invariance
        again = group_topk_sample(
            df.repartition(7), group_cols=["grp"], id_col="doc_id", k=4
        ).collect()
        assert {(r["grp"], r["doc_id"]) for r in again} == {
            (r["grp"], r["doc_id"]) for r in got
        }

    def test_small_groups_kept_whole(self, spark):
        from sssom_curator_spark.operators.sampling import group_topk_sample

        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2], "grp": ["a", "b"]})
        )
        assert group_topk_sample(df, group_cols=["grp"], k=10).count() == 2

    def test_k_validation(self, spark):
        from sssom_curator_spark.operators.sampling import group_topk_sample

        df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "grp": ["a"]}))
        with pytest.raises(ValueError):
            group_topk_sample(df, group_cols=["grp"], k=0)


class TestChunkDocumentsProperties:
    """Reconstruction invariant (hypothesis): dropping each chunk's
    leading `overlap` tokens (except the first chunk's) and concatenating
    restores the document's exact token stream."""

    def test_reconstruction(self, spark):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from sssom_curator_spark.operators.sampling import chunk_documents

        word = st.text("abcXYZ09", min_size=1, max_size=4)

        @settings(max_examples=15, deadline=None)
        @given(
            docs=st.lists(st.lists(word, max_size=40), min_size=1, max_size=5),
            max_tokens=st.integers(min_value=2, max_value=12),
            overlap=st.integers(min_value=0, max_value=11),
        )
        def check(docs, max_tokens, overlap):
            if overlap >= max_tokens:
                overlap = max_tokens - 1
            import pandas as pd

            frame = spark.createDataFrame(
                pd.DataFrame(
                    {
                        "doc_id": range(len(docs)),
                        "text": [" ".join(ws) for ws in docs],
                    }
                )
            )
            rows = chunk_documents(
                frame, max_tokens=max_tokens, overlap=overlap
            ).collect()
            by_doc = {}
            for r in rows:
                by_doc.setdefault(r["doc_id"], []).append(
                    (r["chunk_id"], r["chunk_text"])
                )
            for i, ws in enumerate(docs):
                chunks = [t for _, t in sorted(by_doc.get(i, []))]
                rebuilt = []
                for k, c in enumerate(chunks):
                    toks = c.split(" ") if c else []
                    rebuilt.extend(toks if k == 0 else toks[overlap:])
                assert rebuilt == ws, (ws, chunks, max_tokens, overlap)

        check()


class TestWeightedSample:
    def test_matches_python_oracle_and_bias(self, spark):
        import hashlib
        import math

        from sssom_curator_spark.operators.sampling import weighted_sample

        rows = [(i, 100.0 if i < 10 else 1.0) for i in range(200)]
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "w"])
        )
        got = {r["doc_id"] for r in weighted_sample(df, 20, weight_col="w").collect()}

        def key(i, w):
            h = int(hashlib.md5(f"wsample|{i}".encode()).hexdigest()[:8], 16)
            u = (h + 0.5) / 2**32
            return math.log(u) / w

        want = {
            i for i, _ in sorted(rows, key=lambda r: (-key(*r), r[0]))[:20]
        }
        assert got == want
        assert len(got) == 20
        # heavy-weight rows dominate the sample
        assert len([i for i in got if i < 10]) >= 8

    def test_nonpositive_weights_excluded(self, spark):
        from sssom_curator_spark.operators.sampling import weighted_sample

        df = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2, 3], "w": [1.0, 0.0, None]})
        )
        got = weighted_sample(df, 5, weight_col="w").collect()
        assert [r["doc_id"] for r in got] == [1]
