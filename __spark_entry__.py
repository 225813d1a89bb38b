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
import hashlib
import inspect
import json
import os
import re
import types
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
# the window.  Empty since round 6 for the unproven class; since round
# 12 changed-code detection is AUTOMATIC (``_changed_since_green``
# below), so this list exists only for the residual blind spot the
# closure hash cannot see — behavior changes with no source-reachable
# delta (config defaults, data-file fixtures, or a sibling edit in a
# module the builder imports but whose changed lines its call graph
# does not reach).  Since round 13 module-level dict/list/set
# constants ARE folded into the hash (``_const_repr``), so the
# remaining triggers are config defaults read at runtime and data-file
# fixtures.  Round 13: empty — ``streaming_incremental_sink`` (the
# r12 occupant) went green in CORRECTNESS_r12.
_WINDOW_FIRST: list[str] = []


_SUBMODULE_CACHE: dict[str, object] = {}


def _repo_submodules() -> dict[str, str]:
    """Map bare submodule names to dotted repo paths ('streaming' →
    'getdbt_spark.streaming') so in-body imports — ``from ..streaming
    import batch_equivalent`` leaves only the bare names in
    ``co_names``, never a binding in ``__globals__`` — still resolve
    into the source closure.  The round-11 TZ fix lived exactly
    there."""
    if "__map__" in _SUBMODULE_CACHE:
        return _SUBMODULE_CACHE["__map__"]  # type: ignore[return-value]
    import getdbt_spark

    base = os.path.dirname(os.path.abspath(getdbt_spark.__file__))
    subs: dict[str, str] = {}
    for rel in ("", "queries", "models"):
        d = os.path.join(base, rel) if rel else base
        pkg = "getdbt_spark" + (f".{rel}" if rel else "")
        try:
            entries = os.listdir(d)
        except OSError:
            continue
        for name in entries:
            if name.endswith(".py") and name != "__init__.py":
                subs.setdefault(name[: -len(".py")], f"{pkg}.{name[:-3]}")
    _SUBMODULE_CACHE["__map__"] = subs
    return subs


def _import_submodule(dotted: str):
    """Memoized best-effort import of a repo submodule."""
    if dotted not in _SUBMODULE_CACHE:
        import importlib

        try:
            _SUBMODULE_CACHE[dotted] = importlib.import_module(dotted)
        except Exception:
            _SUBMODULE_CACHE[dotted] = None
    return _SUBMODULE_CACHE[dotted]


def _const_repr(v) -> str:
    """Canonical, process-stable repr for module-level constants folded
    into the closure hash.  ``repr`` alone is wrong for hash-ordered
    containers (dict/set/frozenset iterate in string-hash order, which
    is randomized per process), so containers are rendered with their
    elements sorted by the repr of the key/element.  Depth-capped so a
    pathological self-referencing constant cannot recurse forever."""
    return _const_repr_depth(v, 0)


def _const_repr_depth(v, depth: int) -> str:
    if depth > 6:
        return f"<depth-capped {type(v).__name__}>"
    if isinstance(v, dict):
        items = sorted(v.items(), key=lambda kv: repr(kv[0]))
        body = ", ".join(
            f"{k!r}: {_const_repr_depth(val, depth + 1)}" for k, val in items
        )
        return "{" + body + "}"
    if isinstance(v, (set, frozenset)):
        return (
            type(v).__name__
            + "{"
            + ", ".join(sorted(_const_repr_depth(x, depth + 1) for x in v))
            + "}"
        )
    if isinstance(v, (list, tuple)):
        body = ", ".join(_const_repr_depth(x, depth + 1) for x in v)
        return ("[" if isinstance(v, list) else "(") + body + (
            "]" if isinstance(v, list) else ")"
        )
    if callable(v):
        # functions/classes render as module.qualname — default repr
        # embeds a per-process memory address
        return (
            f"<callable {getattr(v, '__module__', '?')}."
            f"{getattr(v, '__qualname__', type(v).__name__)}>"
        )
    # registry values (Model dataclasses etc.) nest callables whose
    # default repr embeds addresses; strip them so the hash is
    # process-stable
    return re.sub(r" at 0x[0-9a-f]+", "", repr(v))


def _closure_sources(fn) -> tuple[list[str], list[str]]:
    """Deterministic source closure of a registered builder: the
    sources of every repo function REACHABLE from it by name (the
    builder itself, then transitively every ``getdbt_spark`` function
    its code objects reference, resolved through each function's
    globals and through referenced repo modules' attributes), plus
    the ``repr`` of every referenced module-level constant.

    This is what makes the rotation's changed-code detection see
    HELPER edits: round 11's TZ fix lived in ``streaming.py``, not in
    any builder body, and a source hash of the builder alone misses
    it (the round-11 verdict's #1).  Nested code objects (lambdas,
    inner defs) contribute their names too.  Everything is sorted
    before hashing — ``co_names`` resolution walks sets whose
    iteration order depends on string-hash randomization, so an
    unsorted fold would hash differently per process.
    """
    sources: dict[tuple[str, str], str] = {}
    consts: dict[str, str] = {}
    stack = [fn]
    seen: set[tuple[str, str]] = set()
    while stack:
        f = stack.pop()
        key = (
            getattr(f, "__module__", "") or "",
            getattr(f, "__qualname__", "") or "",
        )
        if key in seen:
            continue
        seen.add(key)
        try:
            sources[key] = inspect.getsource(f)
        except (OSError, TypeError):
            sources[key] = repr(f)
        code = getattr(f, "__code__", None)
        if code is None:
            continue
        names: set[str] = set()

        def collect(c) -> None:
            names.update(c.co_names)
            for const in c.co_consts:
                if hasattr(const, "co_names"):
                    collect(const)

        collect(code)
        g = getattr(f, "__globals__", {})
        candidates: dict[str, object] = {}
        repo_mods = []
        subs = _repo_submodules()
        for name in sorted(names):
            v = g.get(name)
            if v is None:
                # in-body `from ..mod import x` leaves only the bare
                # names behind — resolve repo submodules explicitly
                if name in subs:
                    mod = _import_submodule(subs[name])
                    if mod is not None:
                        repo_mods.append(mod)
                continue
            if isinstance(v, types.ModuleType):
                if (v.__name__ or "").startswith("getdbt_spark"):
                    repo_mods.append(v)
                continue
            candidates[name] = v
        for mod in repo_mods:
            for name in sorted(names):
                v = getattr(mod, name, None)
                if v is not None and name not in candidates:
                    candidates[f"{mod.__name__}.{name}"] = v
        for ref, v in sorted(candidates.items()):
            if isinstance(v, types.FunctionType) and (
                getattr(v, "__module__", "") or ""
            ).startswith("getdbt_spark"):
                stack.append(v)
            elif isinstance(
                v, (int, float, str, bytes, tuple, frozenset, dict, list, set)
            ):
                # dict/list/set folding closes the round-12 ADVICE blind
                # spot: a builder reading plans.BOUNDED_NLJ_ALLOW or a
                # probe battery dict was invisible to the change
                # detector.  _const_repr keeps hash-ordered containers
                # process-stable.
                consts[ref] = _const_repr(v)
    return (
        [sources[k] for k in sorted(sources)],
        [f"{k}={v}" for k, v in sorted(consts.items())],
    )


def _registry_hashes() -> dict[str, str]:
    """sha256 per registered id over (builder source closure, referenced
    constants, oracle text) — the rotation's change detector.

    Every repo submodule is imported up front: lazily-populated
    registries (``registry.MODELS`` grows as model modules import)
    are folded into closures as dict constants, so hashing them
    mid-population would make an id's hash depend on which ids were
    walked before it."""
    from getdbt_spark.queries import ORACLES, QUERIES, load_all

    load_all()
    for dotted in sorted(set(_repo_submodules().values())):
        _import_submodule(dotted)
    out: dict[str, str] = {}
    for qid, fn in QUERIES.items():
        h = hashlib.sha256()
        srcs, consts = _closure_sources(fn)
        for s in srcs:
            h.update(s.encode())
            h.update(b"\x00")
        for c in consts:
            h.update(c.encode())
            h.update(b"\x00")
        h.update(b"\x01")
        h.update(ORACLES.get(qid, "").encode())
        out[qid] = h.hexdigest()
    return out


_HASH_FILE = "VERIFIED_HASHES.json"


def _changed_since_green(report_dir: str | None = None) -> set[str]:
    """Ids whose source closure or oracle text no longer matches the
    hash recorded at their last driver-green round
    (``VERIFIED_HASHES.json``, maintained per round by
    ``tools/update_verified_hashes.py``).  These re-enter the driver's
    50-id window AHEAD of the pure-staleness rotation: an id green in
    r09 says nothing about code changed in r11 — the round-11
    verdict's top item.  A missing or malformed hash file degrades to
    "nothing changed" (pure staleness), never a crash.

    Memoized for the process lifetime (keyed by report_dir): the
    underlying ``_registry_hashes`` walk re-reads every registered
    builder's source closure, and both ``queries()`` and
    ``oracle_sql()`` call here on driver import — without the cache
    the driver paid that full inspect.getsource walk twice per import
    (round-12 ADVICE)."""
    here = report_dir or os.path.dirname(os.path.abspath(__file__))
    cache_key = f"__changed_since_green__:{here}"
    if cache_key in _SUBMODULE_CACHE:
        return _SUBMODULE_CACHE[cache_key]  # type: ignore[return-value]
    out = _changed_since_green_uncached(here)
    _SUBMODULE_CACHE[cache_key] = out
    return out


def _changed_since_green_uncached(here: str) -> set[str]:
    try:
        with open(os.path.join(here, _HASH_FILE)) as fh:
            recorded = json.load(fh)
    except (OSError, ValueError):
        return set()
    if not isinstance(recorded, dict):
        return set()
    changed: set[str] = set()
    for qid, cur in _registry_hashes().items():
        row = recorded.get(qid)
        if isinstance(row, dict) and row.get("hash") not in (None, cur):
            changed.add(qid)
    return changed


def _priority_order(
    ids: list[str],
    verified: set[str] | dict[str, int] | None = None,
    changed: set[str] | None = None,
) -> list[str]:
    """Never-verified ids first — hand-prioritized high-value ids, then
    the rest in registration order, fixture scans last within the
    class (lowest-value rows) — then proven ids whose SOURCE CLOSURE
    changed since their last green round (stalest first: their proof
    is doubly suspect), then the remaining proven ids ordered by how
    STALE their proof is (oldest latest-green round first), so with
    full coverage the 50-slot window re-proves changed code first and
    the longest-unchecked ids after.  The sort is stable, so
    registration order is preserved within each tier.  ``verified``
    and ``changed`` are injectable for property tests (a bare
    ``verified`` set means "proven, staleness unknown" and preserves
    registration order); production derives the round map from the
    accumulated driver reports and the changed set from
    ``VERIFIED_HASHES.json``."""
    if verified is None:
        verified = _verified_rounds()
    if changed is None:
        changed = set()
    rounds: dict[str, int] = (
        verified if isinstance(verified, dict) else dict.fromkeys(verified, 0)
    )
    first = {qid: i for i, qid in enumerate(_WINDOW_FIRST)}

    def rank(qid: str) -> tuple[int, int]:
        if qid in first:  # hand-priority leads the WHOLE window
            return (0, first[qid])
        if qid in rounds:
            return (3 if qid in changed else 4, rounds[qid])
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
    ids without a prior driver-green correctness row run first, then
    ids whose code changed since their last green round."""
    from getdbt_spark.queries import QUERIES, load_all

    load_all()
    order = _priority_order(list(QUERIES), changed=_changed_since_green())
    return {qid: QUERIES[qid] for qid in order}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each ANSI-expressible query id."""
    from getdbt_spark.queries import ORACLES, load_all

    load_all()
    order = _priority_order(list(ORACLES), changed=_changed_since_green())
    return {qid: ORACLES[qid] for qid in order}
