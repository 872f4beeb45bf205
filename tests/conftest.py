"""Shared Spark session for the test suite (one JVM for all tests)."""

from __future__ import annotations

import pytest

from sssom_curator_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # tiny fixtures: 8 shuffle partitions keeps the many-stage DAGs snappy
    s = get_spark(
        app_name="sssom-curator-spark-tests",
        master="local[4]",
        extra={"spark.sql.shuffle.partitions": "8"},
    )
    yield s
    s.stop()
