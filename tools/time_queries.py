"""Time named queries with bench.py's exact methodology (min-of-two,
noop sink, build+execute timed, clearCache between reps).

Optimization-round A/B helper: run once on the old code, once on the
new, same session config as bench.py.

Usage:
  python tools/time_queries.py <query_id> [query_id...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), REPS (default 2).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    reps = int(os.environ.get("REPS", "2"))
    from bench import _warmup

    from getdbt_spark.queries import QUERIES, load_all
    from getdbt_spark.session import get_spark

    load_all()
    spark = get_spark(app_name="time_queries")
    _warmup(spark, SF)
    from getdbt_spark.queries.model_queries import _MODEL_QUERIES, _run_model

    out: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            if name in _MODEL_QUERIES:
                df = _run_model(spark, SF, _MODEL_QUERIES[name][0], reuse="checkpoint")
            else:
                df = QUERIES[name](spark, SF)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        out[name] = round(best, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
