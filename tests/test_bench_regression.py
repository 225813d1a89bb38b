"""Per-query performance regression gate against BASELINE_LOCAL.json.

The driver's bench records one number per round but has no memory of
per-query history; this test is the local regression gate the verdict
asked for — every headline query must stay within 2× of its recorded
sf0.01 baseline (plus a 1 s absolute floor so sub-second queries
don't flake on scheduler noise).

Refreshing the baseline after an intentional change:
``SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python bench.py`` and
paste the JSON line under the ``sf0.01`` key (same for sf0.1).
"""

from __future__ import annotations

import json
import os
import time

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.slow
def test_no_per_query_regression_at_sf001(spark):
    import bench
    from getdbt_spark.queries import QUERIES, load_all

    load_all()
    with open(os.path.join(ROOT, "BASELINE_LOCAL.json")) as fh:
        base = json.load(fh)["sf0.01"]["queries"]

    names = [q for q in bench.HEADLINE if q in QUERIES]
    names += [q for q in bench.PIPELINE_HEADLINE if q in QUERIES]
    names += [q for q in bench.MODEL_HEADLINE if q in QUERIES]

    bench._warmup(spark, SF_DIR)
    from getdbt_spark.queries.model_queries import _MODEL_QUERIES, _run_model

    slow: list[str] = []
    for name in names:
        t0 = time.perf_counter()
        if name in bench.MODEL_HEADLINE:
            df = _run_model(
                spark, SF_DIR, _MODEL_QUERIES[name][0], reuse="checkpoint"
            )
        else:
            df = QUERIES[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        took = time.perf_counter() - t0
        spark.catalog.clearCache()
        budget = max(2.0 * base[name], base[name] + 1.0) if name in base else None
        if budget is not None and took > budget:
            slow.append(f"{name}: {took:.2f}s > budget {budget:.2f}s (baseline {base[name]:.2f}s)")
    assert not slow, "per-query bench regression:\n" + "\n".join(slow)
