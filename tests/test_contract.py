"""Driver-contract guards: every oracle must at least BIND in DuckDB
(catches SQL typos at test speed instead of sweep speed), and the
window ordering must put unproven ids first."""

from __future__ import annotations

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    return c


@pytest.mark.slow  # 289 EXPLAINs ≈ 3 min wall — opt-in (pytest -m slow);
# the driver's own verify re-binds 50 oracles per round regardless
def test_every_oracle_binds_in_duckdb(con):
    from getdbt_spark.queries import ORACLES, load_all

    load_all()
    bad = []
    for qid, sql in ORACLES.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as ex:  # noqa: BLE001 — collecting all failures
            bad.append(f"{qid}: {str(ex).splitlines()[0]}")
    assert not bad, "oracles failed to bind:\n" + "\n".join(bad)


def test_window_orders_unproven_ids_first():
    """Invariant only — never pin a specific round's artifact content.

    Round-4 lesson (VERDICT.md): a hard-coded id list here was correct
    when written and became false the moment the driver dropped the next
    CORRECTNESS_r*.json.  The ordering is *self-rotating* on those
    artifacts, so the only stable assertion is the derived one: while
    >=50 unproven ids are waiting, no already-proven id may occupy a
    head-window slot.
    """
    import __spark_entry__ as e

    ids = list(e.queries())
    verified = e._driver_verified_ids()
    head = ids[:50]
    n_unproven = sum(1 for q in ids if q not in verified)
    if n_unproven >= 50:
        assert all(q not in verified for q in head)
    else:
        # tail case: every unproven id must be in the head window
        assert all(q in head for q in ids if q not in verified)
