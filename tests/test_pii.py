"""PII redaction (functions/pii_ops.py)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from tests.test_functions import get_cached_spark

    return get_cached_spark()


def _frame(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(rows)), "text": rows})
    )


SAMPLES = [
    "write to jane.doe+spam@mail-host.co.uk today",
    "server at 10.0.0.1 fell over; 192.168.255.254 took over",
    "call 555-123-4567 or 555.987.6543",
    "mixed: a@b.io via 8.8.8.8 at 555-000-1111",
    "nothing sensitive here, just words and 12345 numbers",
    "",
]


class TestScrubPii:
    def test_redaction_and_counts(self, spark):
        from sssom_curator_spark.functions.pii_ops import scrub_pii

        out = {
            r["doc_id"]: r
            for r in scrub_pii(_frame(spark, SAMPLES)).collect()
        }
        assert out[0]["text"] == "write to <EMAIL> today"
        assert (out[0]["n_email"], out[0]["n_ipv4"], out[0]["n_phone"]) == (1, 0, 0)
        assert out[1]["text"] == "server at <IP> fell over; <IP> took over"
        assert out[1]["n_ipv4"] == 2
        assert out[2]["text"] == "call <PHONE> or <PHONE>"
        assert out[2]["n_phone"] == 2
        assert out[3]["text"] == "mixed: <EMAIL> via <IP> at <PHONE>"
        # untouched text passes through byte-identical, zero counts
        assert out[4]["text"] == SAMPLES[4]
        assert (out[4]["n_email"], out[4]["n_ipv4"], out[4]["n_phone"]) == (0, 0, 0)
        assert out[5]["text"] == ""

    def test_idempotent(self, spark):
        from sssom_curator_spark.functions.pii_ops import scrub_pii

        once = scrub_pii(_frame(spark, SAMPLES))
        twice = scrub_pii(once.select("doc_id", "text"))
        a = sorted(r["text"] for r in once.collect())
        b = sorted(r["text"] for r in twice.collect())
        assert a == b
        # and the second pass finds nothing left to count
        assert all(
            r["n_email"] == r["n_ipv4"] == r["n_phone"] == 0
            for r in twice.collect()
        )

    def test_whole_stage_codegen(self, spark):
        """The scrub must stay a pure map-side projection (no shuffle,
        no python)."""
        from sssom_curator_spark.functions.pii_ops import scrub_pii

        plan = (
            scrub_pii(_frame(spark, SAMPLES))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "Python" not in plan

    def test_kind_subset(self, spark):
        from sssom_curator_spark.functions.pii_ops import scrub_pii

        out = scrub_pii(_frame(spark, SAMPLES), kinds=("email",)).collect()
        by_id = {r["doc_id"]: r for r in out}
        # only email redacted; other kinds left alone and not counted
        assert by_id[3]["text"] == "mixed: <EMAIL> via 8.8.8.8 at 555-000-1111"
        assert "n_ipv4" not in by_id[3].asDict()
