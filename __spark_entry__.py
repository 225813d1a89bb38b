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

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _verified_rounds(report_dir: str | None = None) -> dict[str, int]:
    """Map each driver-green id to the LATEST round that proved it.

    The driver's correctness gate only checks the FIRST 50 entries of
    ``queries()`` per round, so ordering is coverage policy: ids that
    have never received a driver-green row must run inside that window
    first, and — once everything is proven — the ids whose most recent
    green row is OLDEST should cycle back into the window so every id
    gets re-proven against current code every few rounds (an id green
    in r02 says nothing about code changed in r05).

    ``report_dir`` overrides the report location (tests point it at a
    tmpdir of synthetic reports; production always uses the repo root).
    Malformed files/rows are skipped — a corrupt report must degrade to
    "unproven", never crash the driver's import of this module.
    """
    rounds: dict[str, int] = {}
    here = report_dir or os.path.dirname(os.path.abspath(__file__))
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        stem = os.path.basename(path)
        try:
            rnd = int(stem[len("CORRECTNESS_r") : -len(".json")])
        except ValueError:
            continue
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for qid, row in data.items():
            if not isinstance(row, dict):
                continue
            green = row.get("hash_match")
            if green is None:  # rows-only check (no oracle for this id)
                green = row.get("rows_match") and row.get("schema_match")
            if green:
                rounds[qid] = max(rounds.get(qid, 0), rnd)
    return rounds


def _driver_verified_ids(report_dir: str | None = None) -> set[str]:
    """Ids with a green row in any prior CORRECTNESS_r*.json."""
    return set(_verified_rounds(report_dir))


# Hand-priority escape hatch: ids listed here jump to the very front of
# the unproven class.  Empty since round 6 — every previously-listed id
# is driver-green, and the self-deriving rotation (never-verified first,
# fixture scans last, registration order otherwise) is the whole policy.
# Repopulate only if a specific unproven id must pre-empt the rotation.
_WINDOW_FIRST: list[str] = []


def _priority_order(
    ids: list[str], verified: set[str] | dict[str, int] | None = None
) -> list[str]:
    """Never-verified ids first — hand-prioritized high-value ids, then
    the rest in registration order, fixture scans last within the
    class (lowest-value rows) — then already-proven ids ordered by how
    STALE their proof is (oldest latest-green round first), so with
    full coverage the 50-slot window continuously re-proves the
    longest-unchecked ids against current code.  The sort is stable,
    so registration order is preserved within each staleness tier.
    ``verified`` is injectable for property tests (a bare set means
    "proven, staleness unknown" and preserves registration order);
    production derives a {id: latest_green_round} map from the
    accumulated driver reports."""
    if verified is None:
        verified = _verified_rounds()
    rounds: dict[str, int] = (
        verified if isinstance(verified, dict) else dict.fromkeys(verified, 0)
    )
    first = {qid: i for i, qid in enumerate(_WINDOW_FIRST)}

    def rank(qid: str) -> tuple[int, int]:
        if qid in rounds:
            return (3, rounds[qid])
        if qid in first:
            return (0, first[qid])
        return ((2, 0) if qid.startswith("fixture_") else (1, 0))

    return sorted(ids, key=rank)


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
    """One entry per implemented operator from SURVEY.md §2, ordered so
    ids without a prior driver-green correctness row run first."""
    from getdbt_spark.queries import QUERIES, load_all

    load_all()
    return {qid: QUERIES[qid] for qid in _priority_order(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each ANSI-expressible query id."""
    from getdbt_spark.queries import ORACLES, load_all

    load_all()
    return {qid: ORACLES[qid] for qid in _priority_order(list(ORACLES))}
