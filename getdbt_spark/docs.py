"""Project artifacts — dbt's ``docs generate`` / ``state:modified``
surface (SURVEY.md §3: the dbt lifecycle beyond run/test/seed/
snapshot).

``generate_manifest`` walks the registry in DAG order and emits one
entry per model: its dependency edges, materialization config, a
content FINGERPRINT (hash of the builder's source + config + edges),
and the built schema (column names/types from the analyzed plan — no
data is read; pure build mode only analyzes).  ``write_docs`` persists
``manifest.json`` + ``catalog.json`` — the artifacts a lineage UI or a
CI diff consumes.  ``modified_models`` diffs two manifests by
fingerprint: the engine's ``state:modified`` selector (slim CI —
rebuild only models whose code or config changed, plus anything
downstream of them).
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os

from .registry import Model, topo_sort


def _fingerprint(m: Model) -> str:
    try:
        src = inspect.getsource(m.builder)
    except (OSError, TypeError):  # builtins / lambdas from exec
        src = repr(m.builder)
    payload = "\x01".join(
        (
            src,
            repr(m.config),
            repr(tuple(m.refs)),
            repr(tuple(m.sources)),
        )
    )
    return hashlib.md5(payload.encode()).hexdigest()


def generate_manifest(runner) -> dict:
    """{model: {refs, sources, config, fingerprint, columns}} for the
    full registry, in DAG order.  Schemas come from the ANALYZED lazy
    plans (``Runner.run(reuse=None)``) — metadata only, no job runs."""
    out = runner.run(reuse=None)
    manifest: dict[str, dict] = {}
    for m in topo_sort(None, runner.registry):
        df = out[m.name]
        manifest[m.name] = {
            "refs": list(m.refs),
            "sources": [list(s) for s in m.sources],
            "schema": m.config.schema,
            "materialized": m.config.materialized,
            "partition_by": m.config.partition_by,
            "fingerprint": _fingerprint(m),
            "columns": {f.name: f.dataType.simpleString() for f in df.schema},
        }
    return manifest


def write_docs(runner, target_dir: str) -> dict:
    """Write ``manifest.json`` (edges/config/fingerprints) and
    ``catalog.json`` (per-model column catalog); returns the manifest."""
    manifest = generate_manifest(runner)
    os.makedirs(target_dir, exist_ok=True)
    with open(os.path.join(target_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    catalog = {
        name: {"columns": entry["columns"], "schema": entry["schema"]}
        for name, entry in manifest.items()
    }
    with open(os.path.join(target_dir, "catalog.json"), "w") as fh:
        json.dump(catalog, fh, indent=1, sort_keys=True)
    return manifest


def modified_models(
    registry: dict[str, Model], old_manifest: dict
) -> list[str]:
    """``state:modified+``: models whose fingerprint differs from the
    old manifest (or are new), expanded with their downstream closure —
    exactly the set a slim-CI run must rebuild.  DAG-ordered."""
    changed = {
        m.name
        for m in registry.values()
        if _fingerprint(m)
        != old_manifest.get(m.name, {}).get("fingerprint")
    }
    # downstream closure: a model is dirty if any ref is dirty
    ordered = topo_sort(None, registry)
    dirty = set(changed)
    for m in ordered:
        if m.name not in dirty and any(r in dirty for r in m.refs):
            dirty.add(m.name)
    return [m.name for m in ordered if m.name in dirty]
