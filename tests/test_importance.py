"""DSIR importance weighting (operators/importance.py)."""

from __future__ import annotations

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def spark():
    from tests.test_functions import get_cached_spark

    return get_cached_spark()


def _corpus(spark):
    rows = []
    for i in range(20):
        rows.append((i, "alpha beta gamma alpha beta"))        # A-domain
    for i in range(20, 40):
        rows.append((i, "delta epsilon zeta delta epsilon"))   # B-domain
    rows.append((40, "single"))                                # too short
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )


class TestDsirWeights:
    def test_target_domain_scores_higher(self, spark):
        from sssom_curator_spark.operators.importance import dsir_weights

        corpus = _corpus(spark)
        target = spark.createDataFrame(
            pd.DataFrame({"doc_id": [0], "text": ["alpha beta gamma alpha"]})
        )
        got = {
            r["doc_id"]: r for r in dsir_weights(corpus, target).collect()
        }
        assert len(got) == 41  # every corpus doc present
        # A-domain docs beat B-domain docs under an A-domain target
        assert got[0]["score"] > got[20]["score"]
        assert all(got[i]["score"] == got[0]["score"] for i in range(20))
        # sub-n documents: zero grams, zero score
        assert (got[40]["n_grams"], got[40]["score"]) == (0, 0.0)
        assert got[0]["n_grams"] == 4  # 5 words -> 4 bigrams

    def test_partition_invariant(self, spark):
        from sssom_curator_spark.operators.importance import dsir_weights

        corpus = _corpus(spark)
        target = corpus.filter("doc_id < 20")
        a = sorted(map(tuple, dsir_weights(corpus, target).collect()))
        b = sorted(
            map(
                tuple,
                dsir_weights(corpus.repartition(13), target.repartition(5)).collect(),
            )
        )
        assert a == b

    def test_weight_table_broadcasts(self, spark):
        """The bucket-weight dimension must reach the scoring join as a
        broadcast — the corpus side may never shuffle on bucket."""
        from sssom_curator_spark.operators.importance import dsir_weights

        plan = (
            dsir_weights(_corpus(spark), _corpus(spark).filter("doc_id < 20"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
