"""Advance VERIFIED_HASHES.json from the latest correctness report.

Run at ROUND START (the first thing after the driver lands
``CORRECTNESS_r{N}.json``): for every id green in the latest report,
record {round: N, hash: <current source-closure hash>}.  That is
sound exactly then — the round-start HEAD differs from the HEAD the
driver verified only by the report files themselves, so "current
hash" IS the hash of the verified code.  Running it later in the
round would stamp unverified edits as verified; don't.

``__spark_entry__._changed_since_green`` compares these recorded
hashes against the live registry at driver-import time, and
``_priority_order`` boosts any id whose source closure moved since
its last green round into the 50-id window ahead of the pure
staleness rotation (VERDICT r11 #1).

Bootstrap provenance (round 12): the initial file was reconstructed
from git — for each id, the hash was computed at the VERIFICATION
HEAD of its last green round (the parent of the driver's
"round N: verdict/..." commit), via one git worktree per round r06–r11
running the same ``_registry_hashes`` algorithm.

Prints one JSON line summarizing the update.
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def latest_report() -> tuple[int, dict]:
    best_n, best = -1, {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        stem = os.path.basename(path)
        try:
            n = int(stem[len("CORRECTNESS_r") : -len(".json")])
        except ValueError:
            continue
        if n > best_n:
            try:
                with open(path) as fh:
                    data = json.load(fh)
            except (OSError, ValueError):
                continue
            if isinstance(data, dict):
                best_n, best = n, data
    return best_n, best


def main() -> int:
    import __spark_entry__ as e

    n, report = latest_report()
    if n < 0:
        print(json.dumps({"error": "no correctness report found"}))
        return 1
    path = os.path.join(REPO, e._HASH_FILE)
    try:
        with open(path) as fh:
            recorded = json.load(fh)
    except (OSError, ValueError):
        recorded = {}
    current = e._registry_hashes()
    updated, green = 0, 0
    for qid, row in report.items():
        if not isinstance(row, dict):
            continue
        ok = row.get("hash_match")
        if ok is None:
            ok = row.get("rows_match") and row.get("schema_match")
        if not ok:
            continue
        green += 1
        cur = current.get(qid)
        if cur is None:
            continue  # deregistered since the report
        prev = recorded.get(qid)
        if (
            not isinstance(prev, dict)
            or prev.get("round") != n
            or prev.get("hash") != cur
        ):
            updated += 1
        recorded[qid] = {"round": n, "hash": cur}
    restamped = 0
    if "--restamp-all" in sys.argv[1:]:
        # Re-stamp EVERY recorded entry with its current-HEAD hash,
        # keeping the recorded round.  Sound ONLY at round start AND
        # only when the hash ALGORITHM itself changed while
        # ``changed_at_head`` was empty under the old algorithm (i.e.
        # every id's closure still equals its last-verified state, so
        # the new-algorithm hash of HEAD is the new-algorithm hash of
        # the verified code).  Running this after code edits erases
        # the changed-since-green signal for the edited ids; don't.
        for qid, cur in current.items():
            prev = recorded.get(qid)
            if isinstance(prev, dict) and prev.get("hash") != cur:
                recorded[qid] = {"round": prev.get("round", 0), "hash": cur}
                restamped += 1
    with open(path, "w") as fh:
        json.dump(recorded, fh, indent=0, sort_keys=True)
    print(
        json.dumps(
            {
                "report_round": n,
                "green_in_report": green,
                "entries_updated": updated,
                "entries_restamped": restamped,
                "total_entries": len(recorded),
                "changed_at_head": sorted(e._changed_since_green()),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
