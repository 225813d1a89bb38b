"""seeds.py — the ``dbt seed`` surface: declared-schema CSV loading
and ref()-ability through the model registry."""

from __future__ import annotations

import datetime as dt

import pytest

from getdbt_spark.seeds import (
    SEEDS,
    load_seed,
    register_seed_models,
    seed_path,
    seed_rows,
)


def test_seed_loads_with_declared_schema(spark):
    df = load_seed(spark, "npo_net_groups")
    assert [(f.name, f.dataType.simpleString()) for f in df.schema] == [
        ("net", "string"),
        ("net_group", "string"),
        ("reach_target", "double"),
    ]
    rows = {r.net: r for r in df.collect()}
    assert len(rows) == len(seed_rows("npo_net_groups"))
    assert rows["NPO1"].net_group == "main"
    assert rows["NPO1"].reach_target == pytest.approx(0.35)


def test_seed_is_refable_model(spark):
    from getdbt_spark.registry import MODELS
    from getdbt_spark.runner import Runner

    register_seed_models()
    register_seed_models()  # idempotent — duplicate guard allows re-reg
    assert "npo_net_groups" in MODELS
    out = Runner(spark, {}, dt.date(2024, 3, 20)).run(["npo_net_groups"])
    assert out["npo_net_groups"].count() == len(seed_rows("npo_net_groups"))


def test_unknown_seed_rejected():
    with pytest.raises(KeyError):
        seed_path("nope")


def test_every_declared_seed_file_exists():
    import os

    for name in SEEDS:
        assert os.path.exists(seed_path(name)), name
