"""IVFPQ M/K dial sweep on the clustered fixture (round 11).

`sim_recall_clustered` showed the registered demo codebooks (M=4
subspaces × K=4 codes — sized so the DuckDB oracle can replay the
trainer exactly) cannot resolve top-5 ordering among near-equidistant
same-cluster members (recall 0.126 clustered / 0.057 isotropic).
SCALE.md claims a deployment-scale codebook closes the gap toward the
IVF line; this tool turns that claim into numbers: recall@5 of the
IDENTICAL `_ivfpq_top5` stack at increasing M/K against the exact
brute-force top-5 of the same clustered corpus.

Prints one JSON line; paste the table into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# (subspaces M, subdims, codes K, nprobe, rerank, unit):
# bits/vector = M * log2(K); rerank=R adds the IVFADC+R exact
# re-rank of the ADC top-R (None = raw ADC order, the r11 grid);
# unit=True runs the stack on the unit-normalized corpus
# (_unit_embs — the deployment recipe's first step).
GRID = [
    (4, 16, 4, 1, None, False),    # the registered demo: 8 bits/vec
    (4, 16, 16, 1, None, False),   # 16 bits/vec
    (4, 16, 64, 1, None, False),   # 24 bits/vec
    (8, 8, 16, 1, None, False),    # 32 bits/vec
    (8, 8, 64, 1, None, False),    # 48 bits/vec
    (16, 4, 64, 1, None, False),   # 96 bits/vec
    # round-12 deployment recipe and its neighborhood: the re-rank
    # dial dominates every bits-only dial on this fixture
    (8, 8, 256, 2, None, True),    # 64 bits, multiprobe, no re-rank: 0.52
    (8, 8, 256, 2, 32, True),      # sim_ann_ivfpq_normalized: 0.994
    (8, 8, 256, 2, 64, True),      # 1.000
    (4, 16, 64, 2, 64, True),      # cheap codebooks + re-rank: 0.982
]


def main() -> None:
    from pyspark.sql import functions as F

    from getdbt_spark import pipeline as P
    from getdbt_spark.queries import load_all
    from getdbt_spark.session import get_spark

    load_all()
    from getdbt_spark.queries.training_ops import (
        _clustered_embs,
        _ivfpq_top5,
        _unit_embs,
    )

    spark = get_spark(
        "ivfpq_dial", master="local[8]", shuffle_partitions=8
    )
    ce = _clustered_embs(spark, SF_DIR)
    exact5 = (
        P.topk_cosine_blocked(ce, k=10)
        .filter(F.col("rnk") <= 5)
        .select("vec_id", "neighbor_id")
        .localCheckpoint()
    )
    n_q = exact5.select("vec_id").distinct().count()
    rows = []
    valid = ce.filter(P.finite_vec("embedding"))
    unit = _unit_embs(ce).localCheckpoint()
    for m, subdims, k, nprobe, rerank, use_unit in GRID:
        hits = (
            _ivfpq_top5(
                unit if use_unit else valid,
                subspaces=m,
                subdims=subdims,
                pq_k=k,
                nprobe=nprobe,
                rerank=rerank,
            )
            .select("vec_id", "neighbor_id")
            .join(exact5, ["vec_id", "neighbor_id"])
            .count()
        )
        import math

        rows.append(
            {
                "M": m,
                "K": k,
                "bits_per_vec": int(m * math.log2(k)),
                "nprobe": nprobe,
                "rerank": rerank,
                "unit": use_unit,
                "recall_at_5": round(hits / (5 * n_q), 4),
            }
        )
        print(f"# {rows[-1]}", file=sys.stderr)
        spark.catalog.clearCache()
    print(json.dumps({"sf_dir": SF_DIR, "n_queries": n_q, "grid": rows}))


if __name__ == "__main__":
    sys.exit(main())
