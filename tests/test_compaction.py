"""compact_partitions: file-level guarantees the oracle row can't see
— victim selection, one-file-per-partition result, untouched
partitions byte-stable, and data equality through the rewrite."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from getdbt_spark.io import load_table
from getdbt_spark.runner import compact_partitions

SF = "/root/testdata/sf0.001"


def _files(path: str, part: str) -> list[str]:
    pdir = os.path.join(path, part)
    return sorted(
        f
        for f in os.listdir(pdir)
        if f.endswith(".parquet") and not f.startswith(".")
    )


def test_compaction_single_file_and_untouched_partitions(spark):
    path = os.path.join(tempfile.gettempdir(), "getdbt_spark_compact_test")
    shutil.rmtree(path, ignore_errors=True)
    e = load_table(spark, SF, "events").withColumn(
        "evt_date", F.to_date("ts")
    )
    dates = sorted(
        r.evt_date for r in e.select("evt_date").distinct().collect()
    )
    assert len(dates) >= 2
    frag_dates, compact_date = dates[:-1], dates[-1]
    # fragmented partitions: several files each
    (
        e.filter(F.col("evt_date") != F.lit(compact_date))
        .repartition(5, "event_id")
        .write.mode("overwrite")
        .partitionBy("evt_date")
        .parquet(path)
    )
    # one already-compact partition: exactly one file
    (
        e.filter(F.col("evt_date") == F.lit(compact_date))
        .coalesce(1)
        .write.mode("append")
        .partitionBy("evt_date")
        .parquet(path)
    )
    compact_part = f"evt_date={compact_date.isoformat()}"
    before_untouched = _files(path, compact_part)
    assert len(before_untouched) == 1
    before_rows = sorted(
        map(tuple, spark.read.parquet(path).collect())
    )

    victims = compact_partitions(spark, path, "evt_date")

    assert sorted(victims) == [d.isoformat() for d in frag_dates]
    for d in frag_dates:
        assert len(_files(path, f"evt_date={d.isoformat()}")) == 1
    # untouched partition: identical file list (no rewrite churn)
    assert _files(path, compact_part) == before_untouched
    after_rows = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after_rows == before_rows
    # idempotent: second pass finds nothing to do
    assert compact_partitions(spark, path, "evt_date") == []
    shutil.rmtree(path, ignore_errors=True)

def test_compaction_uri_escaped_partition_values(spark):
    """Partition values Spark URI-escapes in directory names (space,
    ':') must still be matched by victim selection AND included in the
    rewrite scan — the pre-fix bug listed them as victims but silently
    dropped their rows from the compacted output."""
    path = os.path.join(tempfile.gettempdir(), "getdbt_spark_compact_esc")
    shutil.rmtree(path, ignore_errors=True)
    df = spark.createDataFrame(
        [(i, v) for i in range(20) for v in ("a b", "c:d", "plain")],
        "n int, part string",
    )
    df.repartition(4, "n").write.mode("overwrite").partitionBy(
        "part"
    ).parquet(path)
    # escaped directory names exist on disk
    dirs = sorted(d for d in os.listdir(path) if d.startswith("part="))
    assert any("%20" in d or "%3A" in d for d in dirs), dirs
    before = sorted(map(tuple, spark.read.parquet(path).collect()))

    victims = compact_partitions(spark, path, "part", min_files=2)

    assert sorted(victims) == ["a b", "c:d", "plain"]
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after == before
    for d in dirs:
        assert len(_files(path, d)) == 1
    shutil.rmtree(path, ignore_errors=True)
