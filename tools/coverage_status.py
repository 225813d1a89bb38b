"""Regenerate COVERAGE.md's per-id driver-status table.

The narrative sections of COVERAGE.md describe WHERE each SURVEY §2
item lives; the status column there must never drift from the driver's
actual reports (round-3 lesson: the doc claimed models were
driver-verified while the newest CORRECTNESS report had them red).
This script derives per-id status mechanically from the union of all
``CORRECTNESS_r*.json`` files and rewrites the block between the
AUTO-STATUS markers, so the claim and the evidence cannot diverge.

Status semantics per id (latest report that mentions the id wins):
- ``green rN``   — hash-verified (or rows+schema for oracle-less ids)
                   by the driver in round N, not contradicted later.
- ``RED rN``     — the newest driver row for the id failed.
- ``never-windowed`` — registered, but no driver report has included
                   the id yet (the 50-row window hasn't reached it);
                   local gate status is all we have.

Usage: python tools/coverage_status.py   (rewrites COVERAGE.md in place)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

BEGIN = "<!-- AUTO-STATUS:BEGIN (tools/coverage_status.py) -->"
END = "<!-- AUTO-STATUS:END -->"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_status() -> tuple[dict[str, tuple[str, int]], list[str]]:
    """(id -> (status, round), consumed-report basenames).

    Later rounds override earlier ones.  A row whose ``err`` is
    ``no_oracle`` (all matches null) is NOT red — the driver had nothing
    to compare against; it stays distinct so the gap is visible without
    masquerading as a failure."""
    status: dict[str, tuple[str, int]] = {}
    consumed: list[str] = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as fh:
                data = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        consumed.append(os.path.basename(path))
        for qid, row in data.items():
            if not isinstance(row, dict):
                continue
            green = row.get("hash_match")
            if green is None:
                green = row.get("rows_match") and row.get("schema_match")
            if green:
                st = "green"
            elif row.get("err") == "no_oracle":
                st = "no-oracle"
            else:
                st = "RED"
            prev = status.get(qid)
            if prev is None or rnd >= prev[1]:
                status[qid] = (st, rnd)
    return status, consumed


def main() -> int:
    sys.path.insert(0, REPO)
    from getdbt_spark.queries import ORACLES, QUERIES, load_all

    load_all()
    driver, consumed = load_status()

    lines = [BEGIN, ""]
    greens = sum(1 for q in QUERIES if driver.get(q, ("", 0))[0] == "green")
    reds = sum(1 for q in QUERIES if driver.get(q, ("", 0))[0] == "RED")
    noracle = sum(1 for q in QUERIES if driver.get(q, ("", 0))[0] == "no-oracle")
    never = len(QUERIES) - greens - reds - noracle
    lines += [
        f"**Driver status, derived from {', '.join(consumed) or '(none)'} "
        f"({len(QUERIES)} registered ids): "
        f"{greens} green, {reds} red, {noracle} no-oracle, "
        f"{never} never-windowed.** "
        f"The driver checks 50 ids per round; `__spark_entry__."
        f"_priority_order` rotates never-windowed (and red) ids to the "
        f"front. Ids without an oracle entry get the weaker rows+schema "
        f"check (marked `rows-only`).",
        "",
        "| query id | driver | oracle |",
        "|---|---|---|",
    ]
    for qid in sorted(QUERIES):
        st = driver.get(qid)
        cell = f"{st[0]} r{st[1]:02d}" if st else "never-windowed"
        oracle = "hash" if qid in ORACLES else "rows-only"
        lines.append(f"| `{qid}` | {cell} | {oracle} |")
    lines += ["", END]
    block = "\n".join(lines)

    path = os.path.join(REPO, "COVERAGE.md")
    with open(path) as fh:
        doc = fh.read()
    if BEGIN in doc and END in doc:
        doc = re.sub(
            re.escape(BEGIN) + ".*?" + re.escape(END),
            lambda _m: block,
            doc,
            flags=re.S,
        )
    else:
        doc = doc.rstrip() + "\n\n## Per-id driver status (generated)\n\n" + block + "\n"
    with open(path, "w") as fh:
        fh.write(doc)
    print(f"COVERAGE.md: {greens} green, {reds} red, {never} never-windowed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
