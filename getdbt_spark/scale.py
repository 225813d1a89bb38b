"""Skew & co-location primitives for the 100 TB execution envelope.

The model/query layers express WHAT to compute; this module carries the
two physical techniques SURVEY.md §4.2 calls out that are not plain
DataFrame idioms:

- **Salting** (`salted_join`, `salted_agg`): when one join/group key
  value carries a disproportionate share of rows (a viral video's
  ``evt_mid``, the empty-string user id), a hash shuffle sends the
  whole hot key to ONE reducer.  AQE's skew-join split covers the join
  case at runtime; salting is the declarative form that also covers
  aggregations and works when AQE's stats are off (e.g. under a UDF
  barrier).  The hot side scatters across ``n_salts`` sub-keys; the
  other side replicates ``n_salts`` ways — correctness is invariant to
  which salt a row lands on.
- **Bucketing** (`write_bucketed`): pre-shuffling a table ON DISK.
  Two tables bucketed by the same key into the same bucket count join
  with ZERO exchanges — at 100 TB that turns the nightly
  fact-to-fact join from the dominant shuffle into a local merge
  (tests/test_scale.py pins the no-Exchange plan).

Both are pure composition of public DataFrame operations — no
engine hooks — so they survive Spark upgrades and AQE re-planning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SALT = "_salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join where ``skewed``'s key distribution is hot.

    ``skewed`` rows scatter uniformly over ``n_salts`` sub-keys (salt
    derived from a per-row id, so no two passes need agree on it);
    ``other`` replicates each row ``n_salts`` times.  The shuffle key
    becomes ``on + [_salt]`` — a hot key now occupies ``n_salts``
    reducers instead of one.  Replication bounds the cost: use this
    when ``other`` is the smaller (but not broadcastable) side.

    Supported ``how``: inner / left (preserving the skewed side) —
    the semantics where per-row salting is transparently correct.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    on = list(on)
    salted = skewed.withColumn(
        SALT, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )
    replicated = other.withColumn(
        SALT,
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")),
    )
    return salted.join(replicated, on + [SALT], how).drop(SALT)


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation for algebraic aggregates.

    ``aggs`` maps output column → ("sum" | "count" | "min" | "max",
    input column).  Stage 1 aggregates on ``keys + [_salt]`` (a hot
    group spreads over ``n_salts`` reducers); stage 2 re-combines the
    ``n_salts`` partials per key (sum-of-sums, sum-of-counts,
    min-of-mins, max-of-maxs).  Spark's own partial aggregation does
    this per input partition already; the salt stage matters when the
    REDUCE side is the bottleneck — a single group too large for one
    task's memory at 100 TB.
    """
    on = list(keys)
    fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    recombine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    stage1 = (
        df.withColumn(
            SALT,
            F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int"),
        )
        .groupBy(*on, SALT)
        .agg(
            *[
                fns[kind](col).alias(out)
                for out, (kind, col) in aggs.items()
            ]
        )
    )
    return stage1.groupBy(*on).agg(
        *[
            recombine[kind](out).alias(out)
            for out, (kind, _col) in aggs.items()
        ]
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    n_buckets: int = 32,
    sort: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``keys``.

    Bucketing is the write-once/join-many trade: the one-time shuffle
    happens at write; every later join or aggregation on ``keys``
    between same-bucketed tables runs exchange-free (bucket pruning
    also serves point lookups).  Catalog-table based — Spark's bucket
    metadata lives in the session catalog, not the parquet files.
    """
    keys = list(keys)
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*sort)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket keys.

    With both sides bucketed by ``on`` into equal bucket counts the
    physical plan contains no ShuffleExchange — the join is per-bucket
    local (verified in tests/test_scale.py).
    """
    return spark.table(left_table).join(
        spark.table(right_table), list(on), how
    )


def zorder_key(
    cols: Sequence[str],
    mins: Sequence[int],
    maxs: Sequence[int],
    bits: int = 8,
):
    """Z-order (Morton) key over integer columns: each column is
    min-max scaled to ``bits`` bits using the LITERAL bounds, then the
    bits are interleaved — rows close in the multi-dimensional key
    space get close keys.  Pure integer arithmetic (scale → floor →
    shift/mask), so the key is deterministic and cross-engine
    replicable.

    Bounds come in as literals (the two-phase anchor pattern): at
    100 TB the min/max pre-pass reads parquet footer stats, not data.
    """
    ncols = len(cols)
    parts = []
    for i, (c, lo, hi) in enumerate(zip(cols, mins, maxs)):
        span = max(int(hi) - int(lo), 1)
        q = F.floor(
            (F.col(c).cast("long") - F.lit(int(lo)))
            * F.lit((1 << bits) - 1)
            / F.lit(span)
        ).cast("long")
        for b in range(bits):
            parts.append(
                F.shiftleft(
                    F.shiftright(q, b).bitwiseAND(F.lit(1)),
                    b * ncols + i,
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 8,
    bits: int = 8,
) -> DataFrame:
    """Multi-dimensional clustering writer — the lakehouse
    ``OPTIMIZE ... ZORDER BY (a, b)`` on plain parquet: rows are
    range-partitioned and sorted by their Z-order key, so every
    output file covers a NARROW range of every clustered column and
    parquet min/max stats prune files for predicates on ANY of them
    (a single-column sort can only prune its leading column).
    Returns the read-back.

    Plan: one stats pre-pass (footer-only at scale), one range
    exchange on the key, an in-partition sort, and the write — the
    same cost as a plain sorted write.
    """
    spark = df.sparkSession
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("long")), F.max(F.col(c).cast("long"))]
    row = df.agg(*aggs).collect()[0]
    # empty-input-safe: zero-row stats pre-pass yields NULL bounds
    mins = [v if v is not None else 0 for v in row[0::2]]
    maxs = [v if v is not None else 0 for v in row[1::2]]
    key = zorder_key(cols, mins, maxs, bits=bits)
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(n_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    from .io import read_parquet_like

    return read_parquet_like(spark, path, df)
