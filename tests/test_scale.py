"""Scale primitives: salting correctness + the bucketed no-shuffle plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from getdbt_spark import scale
from getdbt_spark.io import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def skewed(spark):
    """orders with one synthetic hot key: ~half the rows share custkey 1."""
    o = load_table(spark, SF, "orders")
    return o.withColumn(
        "k", F.when(F.col("o_orderkey") % 2 == 0, 1).otherwise(F.col("o_custkey"))
    )


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_join_matches_plain_join(spark, skewed):
    dim = load_table(spark, SF, "customer").select(
        F.col("c_custkey").alias("k"), "c_name"
    )
    plain = skewed.join(dim, "k", "inner").select("o_orderkey", "c_name")
    salted = scale.salted_join(skewed, dim, ["k"], "inner").select(
        "o_orderkey", "c_name"
    )
    assert _rows(salted, ["o_orderkey", "c_name"]) == _rows(
        plain, ["o_orderkey", "c_name"]
    )


def test_salted_left_join_preserves_unmatched(spark, skewed):
    dim = load_table(spark, SF, "customer").select(
        F.col("c_custkey").alias("k"), "c_name"
    )
    # keep only even custkeys in the dim so the left join has misses
    dim = dim.filter(F.col("k") % 2 == 0)
    plain = skewed.join(dim, "k", "left").select("o_orderkey", "c_name")
    salted = scale.salted_join(skewed, dim, ["k"], "left").select(
        "o_orderkey", "c_name"
    )
    assert _rows(salted, ["o_orderkey", "c_name"]) == _rows(
        plain, ["o_orderkey", "c_name"]
    )


def test_salted_join_shuffles_on_salted_key(spark, skewed):
    dim = load_table(spark, SF, "customer").select(
        F.col("c_custkey").alias("k"), "c_name"
    )
    plan = scale.salted_join(
        skewed, dim, ["k"], "inner"
    )._jdf.queryExecution().toString()
    assert scale.SALT in plan  # the shuffle key includes the salt


def test_salted_agg_matches_plain_agg(spark, skewed):
    # round the double sum: salting reassociates FP addition (the same
    # tolerance any distributed re-partitioning implies)
    plain = skewed.groupBy("k").agg(
        F.round(F.sum("o_totalprice"), 4).alias("total"),
        F.count("o_orderkey").alias("n"),
        F.min("o_orderdate").alias("first_dt"),
        F.max("o_orderdate").alias("last_dt"),
    )
    salted = scale.salted_agg(
        skewed,
        ["k"],
        {
            "total": ("sum", "o_totalprice"),
            "n": ("count", "o_orderkey"),
            "first_dt": ("min", "o_orderdate"),
            "last_dt": ("max", "o_orderdate"),
        },
    ).withColumn("total", F.round("total", 4))
    cols = ["k", "total", "n", "first_dt", "last_dt"]
    assert _rows(salted, cols) == _rows(plain, cols)


def test_bucketed_join_has_no_shuffle(spark, tmp_path_factory):
    """Two tables bucketed on the join key by the same bucket count
    join with ZERO exchanges — the on-disk co-location contract."""
    o = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = load_table(spark, SF, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    scale.write_bucketed(o, "b_orders", ["o_orderkey"], n_buckets=8)
    scale.write_bucketed(li, "b_lineitem", ["o_orderkey"], n_buckets=8)
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = scale.bucketed_join(
                spark, "b_orders", "b_lineitem", ["o_orderkey"]
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan
            assert j.count() == li.count()  # every lineitem matches
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_zorder_files_narrow_in_both_dimensions(spark, tmp_path):
    """Every Z-ordered file covers a narrow range of BOTH clustered
    columns (parquet min/max stats prune on either predicate); a
    hash-shuffled layout leaves every file covering ~the full range
    of each."""
    import glob
    import os

    from getdbt_spark.io import load_table
    from getdbt_spark.scale import write_zordered

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    zpath, hpath = str(tmp_path / "z"), str(tmp_path / "h")
    back = write_zordered(li, zpath, ["l_partkey", "l_suppkey"], n_files=8)
    assert back.count() == li.count()
    li.repartition(8).write.mode("overwrite").parquet(hpath)

    def _avg_width(path, col):
        widths = []
        for f in glob.glob(os.path.join(path, "part-*.parquet")):
            mm = (
                spark.read.parquet(f)
                .agg(F.min(col), F.max(col))
                .collect()[0]
            )
            widths.append(mm[1] - mm[0])
        assert widths
        return sum(widths) / len(widths)

    for col in ("l_partkey", "l_suppkey"):
        z_w, h_w = _avg_width(zpath, col), _avg_width(hpath, col)
        assert z_w < 0.7 * h_w, (col, z_w, h_w)
