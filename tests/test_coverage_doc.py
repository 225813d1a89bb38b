"""Guard: COVERAGE.md's generated table must never lag the driver reports.

Round-4/5 lesson: the driver writes ``CORRECTNESS_r{N}.json`` AFTER the
end-of-round snapshot commit, so the committed COVERAGE.md table is
structurally one round stale unless the next round starts with
``python tools/coverage_status.py``.  The generator stamps the exact
report basenames it consumed into the table header; this test fails
whenever a report file exists on disk that the committed table hasn't
ingested, so the staleness can never go unnoticed past the first
``pytest`` run of a round.
"""

from __future__ import annotations

import glob
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _consumed_reports() -> set[str]:
    with open(os.path.join(REPO, "COVERAGE.md")) as fh:
        doc = fh.read()
    m = re.search(r"derived from ([^(]+)\(", doc)
    assert m, (
        "COVERAGE.md has no 'derived from <reports> (' header — regenerate "
        "with: python tools/coverage_status.py"
    )
    return {name.strip() for name in m.group(1).split(",") if name.strip()}


def test_coverage_table_ingested_every_report():
    on_disk = {
        os.path.basename(p)
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    }
    consumed = _consumed_reports()
    missing = on_disk - consumed
    assert not missing, (
        f"COVERAGE.md is stale: {sorted(missing)} exist on disk but were not "
        "ingested by the committed table. Run: python tools/coverage_status.py"
    )


def test_coverage_table_counts_match_reports():
    """The header's green count must equal the union-of-reports green set
    restricted to registered ids — a hand-edited number can't drift."""
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as e
    from getdbt_spark.queries import QUERIES, load_all

    load_all()
    verified = e._driver_verified_ids()
    expect_green = len(verified & set(QUERIES))
    with open(os.path.join(REPO, "COVERAGE.md")) as fh:
        doc = fh.read()
    m = re.search(r"registered ids\): (\d+) green", doc)
    assert m, "COVERAGE.md header missing the green count"
    assert int(m.group(1)) == expect_green, (
        f"COVERAGE.md claims {m.group(1)} green but reports say "
        f"{expect_green}. Run: python tools/coverage_status.py"
    )
