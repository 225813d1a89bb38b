"""CLI surface tests (python -m getdbt_spark ...) — the dbt-verb
command layer over the library API."""

from __future__ import annotations

import io

import pytest

from getdbt_spark.__main__ import main

SF = "/root/testdata/sf0.001"


def _run(argv):
    out = io.StringIO()
    rc = main(argv, out=out)
    return rc, out.getvalue()


def test_ls_lists_models_in_dependency_order(spark):
    rc, text = _run(["ls"])
    assert rc == 0
    lines = [l.split()[0] for l in text.splitlines()]
    assert "poms_flattened" in lines
    # a ref'ing model must appear after its upstream source model
    assert lines.index("audiovisual_metadata_poms_metadata_v1") < lines.index(
        "poms_flattened"
    )


def test_run_select_materializes_closure(spark):
    rc, text = _run(["--sf-dir", SF, "run", "--select", "poms_flattened"])
    assert rc == 0
    assert "poms_flattened" in text and "OK: 2 model(s)" in text


def test_test_exits_nonzero_on_declared_failures(spark):
    rc, text = _run(["--sf-dir", SF, "test"])
    # the fixture deliberately plants nulls: dbt-style nonzero exit
    assert rc == 1
    assert "FAIL" in text and "tests passed" in text


def test_seed_loads_declared_seeds(spark):
    rc, text = _run(["seed"])
    assert rc == 0
    assert "npo_net_groups" in text


def test_sql_after_run_answers_over_views(spark):
    rc, text = _run([
        "--sf-dir", SF, "sql",
        "SELECT count(*) AS n FROM poms_flattened",
        "--select", "poms_flattened",
    ])
    assert rc == 0
    assert "n" in text


def test_snapshot_creates_and_evolves_scd2(spark, tmp_path):
    args = [
        "--sf-dir", SF, "snapshot", "--source", "dim_poms_episodes",
        "--key", "episode_id", "--check-cols", "episode_type",
        "--warehouse", str(tmp_path),
    ]
    rc, text = _run(args)
    assert rc == 0 and "rows=" in text
    # second run over identical data: row count unchanged (no churn)
    rc2, text2 = _run(args)
    assert rc2 == 0 and text2.split("rows=")[1] == text.split("rows=")[1]


def test_freshness_pass_and_error_thresholds(spark):
    """Anchor == max loaded date, so everything passes at defaults; a
    negative error-after forces every stream into error (nonzero exit,
    dbt contract)."""
    rc, text = _run(["--sf-dir", SF, "freshness"])
    assert rc == 0
    assert "5/5 sources fresh enough" in text

    rc, text = _run(
        ["--sf-dir", SF, "freshness", "--warn-after", "-2",
         "--error-after", "-1"]
    )
    assert rc == 1
    assert "ERROR" in text


def test_backfill_replays_incremental_range(spark, tmp_path):
    wh = str(tmp_path / "wh")
    rc, text = _run(
        ["--sf-dir", SF, "backfill",
         "--select", "atinternet_smarttag_streams_daily_v4",
         "--start", "2024-01-10", "--end", "2024-01-30",
         "--warehouse", wh]
    )
    assert rc == 0
    assert "backfilled atinternet_smarttag_streams_daily_v4" in text
    import os

    table = os.path.join(
        wh, "atinternet_smarttag_streams_daily",
        "atinternet_smarttag_streams_daily_v4",
    )
    parts = [p for p in os.listdir(table) if p.startswith("evt_date=")]
    assert parts, "backfill wrote no partitions"


def test_docs_and_state_modified_selector(spark, tmp_path):
    """docs writes manifest+catalog for every model; an unchanged
    registry yields an empty state:modified set; a touched builder
    dirties itself plus its downstream closure."""
    import dataclasses
    import json

    from getdbt_spark import models as M
    from getdbt_spark.docs import modified_models
    from getdbt_spark.registry import MODELS

    target = str(tmp_path / "docs")
    rc, text = _run(["--sf-dir", SF, "docs", "--target", target])
    assert rc == 0 and "manifest.json" in text

    manifest = json.load(open(f"{target}/manifest.json"))
    M.load_all()
    assert set(manifest) == set(MODELS)
    for entry in manifest.values():
        assert entry["columns"] and entry["fingerprint"]

    assert modified_models(MODELS, manifest) == []

    rc, text = _run(["ls", "--modified", target])
    assert rc == 0 and text.strip() == ""

    # touch one upstream model's config → it and its consumers are dirty
    touched = dict(MODELS)
    name = "atinternet_smarttag_streams_daily_v4"
    touched[name] = dataclasses.replace(
        touched[name],
        config=dataclasses.replace(
            touched[name].config, replay_days=11
        ),
    )
    dirty = modified_models(touched, manifest)
    assert name in dirty
    assert "integral_reporting_vodstreaming" in dirty  # downstream
    assert "poms_flattened" not in dirty  # unrelated
