"""Shared Spark session for the test suite (one JVM for all tests)."""

from __future__ import annotations

import pytest

from sssom_curator_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="sssom-curator-spark-tests", master="local[4]")
    yield s
    s.stop()
