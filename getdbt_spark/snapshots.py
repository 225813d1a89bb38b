"""SCD2 snapshot hook — the dbt ``snapshots/`` capability surface.

The reference declares the capability but ships no snapshots
(``snapshots/.gitkeep``; SURVEY.md §1.1/§2.10), so this is the engine
hook: dbt's *check strategy* snapshot semantics on plain Parquet, no
Delta/MERGE required.

Semantics (dbt check-strategy):
- A snapshot table carries the source columns plus
  ``dbt_valid_from``/``dbt_valid_to`` (NULL = current row).
- On each run with an ``as_of`` timestamp: source rows whose tracked
  columns changed close their current version (``valid_to = as_of``)
  and open a new one; unchanged rows pass through; keys that vanished
  from the source are left open (dbt's default: no hard-delete
  tracking unless invalidate_hard_deletes).

Spark-first plan: one full-outer-ish comparison expressed as a
left join of current-version rows to the source on the key, a change
predicate over the tracked columns (NULL-safe ``eqNullSafe``), and a
three-way union (untouched history + closed versions + new versions).
Everything shuffles once on the snapshot key; at 100 TB the snapshot
table is written partitioned by ``valid_from`` date so incremental
runs prune to recent versions.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VALID_FROM = "dbt_valid_from"
VALID_TO = "dbt_valid_to"


def _ts(as_of: dt.datetime) -> F.Column:
    """Snapshot validity bounds are naive wall-clock (TIMESTAMP_NTZ).

    Built from the ISO string, not ``F.lit(datetime)``: a datetime lit
    is converted to an instant using the *driver process* TZ and then
    re-rendered in the session TZ (Europe/Amsterdam) — shifting the
    wall clock by the TZ offset.  String → NTZ parse is TZ-free."""
    return F.lit(as_of.isoformat(sep=" ")).cast("timestamp_ntz")


def snapshot_init(source: DataFrame, as_of: dt.datetime) -> DataFrame:
    """First snapshot run: every source row becomes an open version."""
    return source.withColumn(VALID_FROM, _ts(as_of)).withColumn(
        VALID_TO, F.lit(None).cast("timestamp_ntz")
    )


def snapshot_apply(
    snapshot: DataFrame,
    source: DataFrame,
    key: str,
    check_cols: Sequence[str],
    as_of: dt.datetime,
) -> DataFrame:
    """One SCD2 check-strategy run; returns the new snapshot table."""
    history = snapshot.filter(F.col(VALID_TO).isNotNull())
    current = snapshot.filter(F.col(VALID_TO).isNull())

    src = source.select(
        F.col(key).alias("_src_key"),
        *[F.col(c).alias(f"_src_{c}") for c in check_cols],
    )
    joined = current.join(src, current[key] == src["_src_key"], "left")

    changed = F.lit(False)
    for c in check_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.col(f"_src_{c}"))
    # Key present in source AND any tracked column differs.
    change_pred = F.col("_src_key").isNotNull() & changed

    keep_cols = snapshot.columns
    unchanged_current = joined.filter(~change_pred).select(*keep_cols)
    closed = (
        joined.filter(change_pred)
        .select(*keep_cols)
        .withColumn(VALID_TO, _ts(as_of))
    )
    changed_keys = joined.filter(change_pred).select(
        current[key].alias("_k")
    )
    reopened = (
        source.join(changed_keys, source[key] == F.col("_k"), "inner")
        .drop("_k")
        .withColumn(VALID_FROM, _ts(as_of))
        .withColumn(VALID_TO, F.lit(None).cast("timestamp_ntz"))
    )
    new_keys = (
        source.join(current, on=key, how="left_anti")
        .withColumn(VALID_FROM, _ts(as_of))
        .withColumn(VALID_TO, F.lit(None).cast("timestamp_ntz"))
    )
    return (
        history.unionByName(unchanged_current)
        .unionByName(closed)
        .unionByName(reopened.select(*keep_cols))
        .unionByName(new_keys.select(*keep_cols))
    )
