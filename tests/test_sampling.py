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
        assert hex_threshold(1.0) == "ffffffff"
        with pytest.raises(ValueError):
            hex_threshold(1.5)
