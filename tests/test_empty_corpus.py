"""Every registered query must survive an EMPTY corpus.

The empty-partition / new-tenant case: at 100 TB a query routinely
runs over a source slice with zero rows (a fresh tenant, a pruned
date range, a feed outage).  Round 6's sweep found 13 operators that
crashed driver-side instead — every one a scalar-anchor site
(``.collect()[0][0]`` → ``None - timedelta`` / ``float(None)``) or a
schema-less parquet read-back of a zero-row write
(UNABLE_TO_INFER_SCHEMA).  The fixes route through
``io.scalar_anchor`` (anchor defaulting preserves the output schema
and yields zero rows naturally) and ``io.read_parquet_like``
(schema-supplied read-back); this sweep keeps the whole registry
honest for any operator added later.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def empty_sf(spark, tmp_path_factory):
    """Zero-row corpus with the exact sf0.001 schemas."""
    out = str(tmp_path_factory.mktemp("empty_sf"))
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        df.limit(0).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    return out


@pytest.mark.slow
def test_every_query_survives_empty_corpus(spark, empty_sf):
    from getdbt_spark.queries import QUERIES, load_all

    load_all()
    fails = {}
    for qid, fn in QUERIES.items():
        try:
            fn(spark, empty_sf).count()
        except Exception as e:  # noqa: BLE001 — collecting the full list
            fails[qid] = f"{type(e).__name__}: {str(e).splitlines()[0][:140]}"
    assert not fails, (
        f"{len(fails)} queries crash on an empty corpus:\n"
        + "\n".join(f"  {k}: {v}" for k, v in sorted(fails.items()))
    )


@pytest.fixture(scope="session")
def null_sf(spark, tmp_path_factory):
    """Corpus where every nullable-prone column is entirely NULL —
    failed text extraction, missing media payloads, absent metadata."""
    from pyspark.sql import functions as F

    nulls = {
        "documents": ["text", "lang", "source"],
        "events": ["props", "value", "event_type"],
        "embeddings": ["label"],
        "orders": ["o_comment", "o_orderpriority", "o_clerk"],
        "lineitem": [
            "l_comment", "l_shipinstruct", "l_shipmode",
            "l_returnflag", "l_linestatus",
        ],
        "customer": ["c_comment", "c_mktsegment", "c_phone"],
        "part": ["p_comment", "p_type", "p_brand", "p_container"],
        "supplier": ["s_comment"],
        "nation": ["n_comment"],
        "region": ["r_comment"],
    }
    out = str(tmp_path_factory.mktemp("null_sf"))
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        types = dict(df.dtypes)
        for c in nulls.get(t, []):
            if c in df.columns:
                df = df.withColumn(c, F.lit(None).cast(types[c]))
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    return out


@pytest.mark.slow
def test_every_query_survives_all_null_columns(spark, null_sf):
    """Round 6's second sweep: 13 Arrow/pandas kernels crashed on null
    text / null binary payloads (`None.lower()`, `len(None)`,
    `int(NaN)`) — one corrupt document must not kill the job.  Kernel
    contracts now: null text ≡ empty text (zero shingles/tokens — the
    oracle's unnest-of-NULL parity), null media payload ≡ skip row
    (the decode-failure path), null token weight ≡ 0."""
    from getdbt_spark.queries import QUERIES, load_all

    load_all()
    fails = {}
    for qid, fn in QUERIES.items():
        try:
            fn(spark, null_sf).count()
        except Exception as e:  # noqa: BLE001
            fails[qid] = f"{type(e).__name__}: {str(e).splitlines()[0][:140]}"
    assert not fails, (
        f"{len(fails)} queries crash on an all-NULL-column corpus:\n"
        + "\n".join(f"  {k}: {v}" for k, v in sorted(fails.items()))
    )


@pytest.fixture(scope="session")
def uniform_sf(spark, tmp_path_factory):
    """Degenerate-statistics corpus: every event on ONE timestamp with
    near-constant values — zero variance, zero gaps, single day."""
    from pyspark.sql import functions as F

    out = str(tmp_path_factory.mktemp("uniform_sf"))
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        if t == "events":
            df = df.withColumn(
                "ts", F.lit("2024-01-15 12:00:00").cast("timestamp_ntz")
            ).withColumn("value", (F.col("event_id") % 7).cast("double"))
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    return out


@pytest.mark.slow
def test_every_query_survives_uniform_corpus(spark, uniform_sf):
    """Round 6's third sweep class: zero-variance statistics.  A
    single-day constant-value feed made `dq_anomaly_zscore` crash with
    an ANSI DIVIDE_BY_ZERO (sigma = 0) where the oracle's
    NULL-on-zero-division semantics quietly flag nothing.  Division by
    possibly-degenerate aggregates must use try_divide/safe_divide."""
    from getdbt_spark.queries import QUERIES, load_all

    load_all()
    fails = {}
    for qid, fn in QUERIES.items():
        try:
            fn(spark, uniform_sf).count()
        except Exception as e:  # noqa: BLE001
            fails[qid] = f"{type(e).__name__}: {str(e).splitlines()[0][:140]}"
    assert not fails, (
        f"{len(fails)} queries crash on a zero-variance corpus:\n"
        + "\n".join(f"  {k}: {v}" for k, v in sorted(fails.items()))
    )


# -- anchored queries: full ORACLE PARITY on the degenerate corpus ----------
#
# r6 ADVICE: Spark substitutes a literal default run date when events
# is empty (io.scalar_anchor) while the oracles' max(...) FILTER
# anchors were NULL — so the degenerate regime was only no-crash
# tested, never parity tested.  The oracles now COALESCE to the same
# defaults; these tests prove both engines agree bit-for-bit when the
# anchor source is empty.

ANCHORED = [
    "fn_current_date",             # default 2024-01-30 (model_queries)
    "dq_freshness",                # default 1970-01-01 (extensions)
    "sink_partitioned_read_pruned",  # default 1970-01-01 (extensions)
    "model_dashboard_channel_weekly",  # MODEL_CTES anchor, 2024-01-30
]


@pytest.fixture(scope="session")
def empty_file_sf(tmp_path_factory):
    """Zero-row corpus as SINGLE parquet files (DuckDB's read_parquet
    pattern expects files, not Spark part-directories)."""
    import pyarrow.parquet as pq

    out = str(tmp_path_factory.mktemp("empty_file_sf"))
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        src = pq.read_table(f"/root/testdata/sf0.001/{t}.parquet")
        pq.write_table(src.slice(0, 0), f"{out}/{t}.parquet")
    return out


@pytest.mark.slow
def test_anchored_queries_match_oracle_on_empty_corpus(spark, empty_file_sf):
    import os
    import sys

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ))
    import verify_local as V

    from getdbt_spark.queries import ORACLES, QUERIES, load_all

    load_all()
    con = V.duck_con(empty_file_sf)
    bad = []
    for qid in ANCHORED:
        ok, _spd, _dkd = V.compare(
            qid, QUERIES[qid](spark, empty_file_sf), con, ORACLES.get(qid),
            verbose=False,
        )
        if not ok:
            bad.append(qid)
        spark.catalog.clearCache()
    assert not bad, (
        "anchored queries diverge from the oracle on an EMPTY corpus "
        f"(default-anchor asymmetry): {bad}"
    )
