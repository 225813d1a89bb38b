"""Property tests for the driver-window rotation machinery.

The whole remaining verification debt drains through
``__spark_entry__._driver_verified_ids`` + ``_priority_order``: if that
pair ever mis-reads a CORRECTNESS report or lets a proven id camp in the
50-slot head window, the rotation silently stalls and never-windowed ids
never get their driver row.  These tests drive both functions with
randomized synthetic reports — green / red / rows-only / ``no_oracle`` /
malformed — so the invariants hold for ANY artifact set a future round
might drop, not just the ones that exist today (the round-4 failure mode
was a test pinned to one round's artifact content).
"""

from __future__ import annotations

import json
import os

from hypothesis import given, settings
from hypothesis import strategies as st

import __spark_entry__ as e

IDS = [f"q{i:03d}" for i in range(12)]


def _green_row():
    return {"rows_match": True, "schema_match": True, "hash_match": True}


def _red_row():
    return {"rows_match": True, "schema_match": True, "hash_match": False}


def _rows_only_row():
    # oracle-less id: driver records a weaker rows+schema check
    return {"rows_match": True, "schema_match": True, "hash_match": None}


def _no_oracle_row():
    # r4-style: driver could not compare at all (err="no_oracle")
    return {
        "rows_match": None,
        "schema_match": None,
        "hash_match": None,
        "err": "no_oracle",
    }


ROW_KINDS = {
    "green": _green_row,
    "red": _red_row,
    "rows_only": _rows_only_row,
    "no_oracle": _no_oracle_row,
    "malformed": lambda: "not-a-dict",
}

report_strategy = st.dictionaries(
    st.sampled_from(IDS),
    st.sampled_from(sorted(ROW_KINDS)),
    max_size=len(IDS),
)


def _write_reports(tmpdir: str, reports: list[dict[str, str]]) -> None:
    for rnd, rep in enumerate(reports, start=1):
        body = {qid: ROW_KINDS[kind]() for qid, kind in rep.items()}
        path = os.path.join(tmpdir, f"CORRECTNESS_r{rnd:02d}.json")
        with open(path, "w") as fh:
            json.dump(body, fh)


@settings(max_examples=60, deadline=None)
@given(st.lists(report_strategy, min_size=0, max_size=4))
def test_verified_semantics(reports):
    # fresh dir per hypothesis example
    import tempfile

    with tempfile.TemporaryDirectory() as tmpdir:
        _write_reports(tmpdir, reports)
        verified = e._driver_verified_ids(report_dir=tmpdir)
        # an id is verified iff ANY round gave it a green or rows-only row
        expect = {
            qid
            for rep in reports
            for qid, kind in rep.items()
            if kind in ("green", "rows_only")
        }
        assert verified == expect


@settings(max_examples=60, deadline=None)
@given(
    st.sets(st.sampled_from(IDS), max_size=len(IDS)),
    st.permutations(IDS),
)
def test_priority_order_invariants(verified, order):
    out = e._priority_order(list(order), verified=verified)
    assert sorted(out) == sorted(order), "ordering must be a permutation"
    # every unproven id precedes every proven id — a proven id can never
    # occupy a window slot while an unproven one waits
    ranks = {qid: i for i, qid in enumerate(out)}
    unproven = [q for q in order if q not in verified]
    proven = [q for q in order if q in verified]
    if unproven and proven:
        assert max(ranks[q] for q in unproven) < min(ranks[q] for q in proven)
    # stability: registration order preserved within the proven class
    assert proven == [q for q in out if q in verified]


@settings(max_examples=60, deadline=None)
@given(
    st.dictionaries(st.sampled_from(IDS), st.integers(1, 9), max_size=len(IDS)),
    st.permutations(IDS),
)
def test_proven_ids_cycle_stalest_first(rounds, order):
    """With a {id: latest_green_round} map, proven ids are ordered by
    staleness (oldest round first), so the window re-proves the ids
    that have gone longest without a driver check."""
    out = e._priority_order(list(order), verified=rounds)
    assert sorted(out) == sorted(order)
    proven = [q for q in out if q in rounds]
    assert [rounds[q] for q in proven] == sorted(rounds[q] for q in proven)
    # stability within a staleness tier: registration order preserved
    reg = {q: i for i, q in enumerate(order)}
    for a, b in zip(proven, proven[1:]):
        if rounds[a] == rounds[b]:
            assert reg[a] < reg[b]


def test_verified_rounds_takes_latest_green(tmp_path):
    """An id green in r01 and re-green in r03 is FRESH (round 3); an id
    green only in r01 is stale and must precede it in the window."""
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"stale": _green_row(), "fresh": _green_row()})
    )
    (tmp_path / "CORRECTNESS_r03.json").write_text(
        json.dumps({"fresh": _green_row(), "red_again": _red_row()})
    )
    rounds = e._verified_rounds(report_dir=str(tmp_path))
    assert rounds == {"stale": 1, "fresh": 3}
    out = e._priority_order(["fresh", "stale"], verified=rounds)
    assert out == ["stale", "fresh"]


def test_malformed_reports_never_crash(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text("{broken json")
    (tmp_path / "CORRECTNESS_r02.json").write_text('["a", "list"]')
    (tmp_path / "CORRECTNESS_r03.json").write_text(
        json.dumps({"q001": "string-row", "q002": _green_row()})
    )
    assert e._driver_verified_ids(report_dir=str(tmp_path)) == {"q002"}


def test_no_oracle_rows_stay_unproven(tmp_path):
    """r4 regression shape: err=no_oracle rows have all-null matches and
    must NOT count as proven — they still need an invariant oracle."""
    (tmp_path / "CORRECTNESS_r04.json").write_text(
        json.dumps({"q001": _no_oracle_row(), "q002": _green_row()})
    )
    assert e._driver_verified_ids(report_dir=str(tmp_path)) == {"q002"}


@settings(max_examples=60, deadline=None)
@given(
    st.dictionaries(st.sampled_from(IDS), st.integers(1, 9), max_size=len(IDS)),
    st.sets(st.sampled_from(IDS), max_size=len(IDS)),
    st.permutations(IDS),
)
def test_changed_ids_precede_unchanged_proven(rounds, changed, order):
    """Proven ids whose source closure changed since their green round
    re-enter the window AFTER every unproven id but BEFORE every
    unchanged proven id, stalest first within the class (VERDICT r11
    #1: changed code outranks pure staleness)."""
    out = e._priority_order(list(order), verified=rounds, changed=changed)
    assert sorted(out) == sorted(order)
    ranks = {qid: i for i, qid in enumerate(out)}
    unproven = [q for q in order if q not in rounds]
    chg = [q for q in order if q in rounds and q in changed]
    unchg = [q for q in order if q in rounds and q not in changed]
    if unproven and chg:
        assert max(ranks[q] for q in unproven) < min(ranks[q] for q in chg)
    if chg and unchg:
        assert max(ranks[q] for q in chg) < min(ranks[q] for q in unchg)
    # stalest-first within each proven class
    for cls in (chg, unchg):
        got = [q for q in out if q in cls]
        assert [rounds[q] for q in got] == sorted(rounds[q] for q in got)


def test_changed_since_green_degrades_on_bad_file(tmp_path):
    """A missing or malformed VERIFIED_HASHES.json must degrade to
    'nothing changed' (pure staleness rotation), never crash the
    driver's import."""
    assert e._changed_since_green(report_dir=str(tmp_path)) == set()
    (tmp_path / e._HASH_FILE).write_text("{broken")
    assert e._changed_since_green(report_dir=str(tmp_path)) == set()
    (tmp_path / e._HASH_FILE).write_text('["a list"]')
    assert e._changed_since_green(report_dir=str(tmp_path)) == set()


def test_registry_hashes_are_stable_within_session_and_complete():
    """Two in-process computations agree (the sort discipline inside
    _closure_sources is doing its job) and every registered id gets a
    hash; cross-process determinism is exercised by the committed
    VERIFIED_HASHES.json itself — a nondeterministic hash would flag
    the whole registry as changed on the next driver import."""
    from getdbt_spark.queries import QUERIES, load_all

    load_all()
    a = e._registry_hashes()
    b = e._registry_hashes()
    assert a == b
    assert set(a) == set(QUERIES)


def test_window_first_leads_the_whole_window():
    """A hand-prioritized id outranks even unproven ids — the escape
    hatch for behavior changes the closure hash cannot see."""
    old = e._WINDOW_FIRST[:]
    e._WINDOW_FIRST[:] = ["q005"]
    try:
        out = e._priority_order(
            ["q001", "q005", "q009"],
            verified={"q005": 3, "q009": 1},
            changed=set(),
        )
        assert out[0] == "q005"
        assert out[1] == "q001"  # unproven next
    finally:
        e._WINDOW_FIRST[:] = old
