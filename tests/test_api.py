"""Top-level API contract: the sql() registered-view guard and the
run() → sql() round trip (SURVEY.md §3.3)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def test_sql_raises_before_run(spark):
    """A session where run() never registered model views must get the
    actionable error, not TABLE_OR_VIEW_NOT_FOUND from deep inside
    analysis.  newSession(): fresh view catalog, same JVM — also
    exercises the per-session plan caches."""
    from getdbt_spark import api

    fresh = spark.newSession()
    with pytest.raises(RuntimeError, match="no model views"):
        api.sql(fresh, "SELECT 1 FROM poms_flattened")


def test_run_then_sql_roundtrip(spark):
    from getdbt_spark import api

    fresh = spark.newSession()
    api.run(fresh, SF, select=["poms_flattened"])
    n = api.sql(fresh, "SELECT count(*) AS n FROM poms_flattened").collect()[0][0]
    assert n > 0
