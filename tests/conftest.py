"""Shared Spark fixture: one local session for the whole test run."""

from __future__ import annotations

import pytest

from getdbt_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="getdbt_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
