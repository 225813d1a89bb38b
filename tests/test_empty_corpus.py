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
