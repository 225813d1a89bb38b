"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``getdbt_spark``: the query/oracle registry is
``getdbt_spark.queries.QUERIES`` / ``ORACLES`` populated by
``load_all()``, so this file stays a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Uses the date-spine weekly-rollup shape (reference
    ``integral_reporting_dashboard_channel_weekly.sql``): spine +
    ISO-week join + conditional agg — the pipeline's signature pattern.
    """
    from getdbt_spark.queries import QUERIES, load_all

    load_all()
    return QUERIES["join_date_spine"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from getdbt_spark.queries import QUERIES, load_all

    load_all()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each ANSI-expressible query id."""
    from getdbt_spark.queries import ORACLES, load_all

    load_all()
    return dict(ORACLES)
