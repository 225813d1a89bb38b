"""Seed loader — the engine's ``dbt seed`` surface.

dbt seeds are small, version-controlled CSV files in the project's
``data/`` directory, loaded into the warehouse and referenceable via
``ref()`` like any model.  The reference declares the capability but
ships the directory empty (``data/.gitkeep``; SURVEY §1.1/§3.2).
Here the hook is functional: CSVs live in ``getdbt_spark/seeds/``,
every seed declares an EXPLICIT schema (never ``inferSchema`` — a
type flip on a new row is a silent downstream break; dbt pins seed
column types the same way via ``seeds.column_types``), and
``register_seed_models`` puts each seed in the model registry so
downstream models take a normal ``ref()`` dependency on it.

Scale: a seed is by definition driver-small (it is a file in the
repo); Spark reads it as one task and every join against it should
broadcast — the consumer query in queries/model_queries.py pins that
shape.
"""

from __future__ import annotations

import csv
import os

from pyspark.sql import DataFrame, SparkSession

from .registry import model

SEED_DIR = os.path.join(os.path.dirname(__file__), "seeds")

# name -> explicit DDL schema (the dbt `seeds: column_types:` analog).
SEEDS: dict[str, str] = {
    "npo_net_groups": "net string, net_group string, reach_target double",
}


def seed_path(name: str) -> str:
    if name not in SEEDS:
        raise KeyError(f"unknown seed {name!r}")
    return os.path.join(SEED_DIR, f"{name}.csv")


def load_seed(spark: SparkSession, name: str) -> DataFrame:
    """Read one seed CSV with its declared schema (header skipped)."""
    return (
        spark.read.schema(SEEDS[name])
        .option("header", True)
        .csv(seed_path(name))
    )


def seed_rows(name: str) -> list[list[str]]:
    """Raw CSV rows (minus header) — for oracle literal generation, so
    the DuckDB side is built from the SAME file the engine reads."""
    with open(seed_path(name), newline="") as f:
        rows = list(csv.reader(f))
    return rows[1:]


def register_seed_models() -> None:
    """Register every seed as a zero-input model (→ ``dbt seed`` makes
    seeds ref()-able; the registry's duplicate guard makes this
    idempotent)."""
    for name in SEEDS:

        @model(name)
        def _seed(ctx, _name=name):
            return load_seed(ctx.spark, _name)

        _seed.__name__ = name
        _seed.__doc__ = f"Seed CSV {name}.csv (declared schema, dbt seed)."
