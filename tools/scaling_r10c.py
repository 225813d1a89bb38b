"""One-off decade measurement for the round-10 third batch
(training_ops additions): sf0.1 -> sf1 wall-clock and alpha, matching
the SCALING.md "Round-10 additions" table methodology (same warmup,
noop sink, min-of-one per SF on a quiet box).

Usage: python tools/scaling_r10c.py   (prints the markdown rows)
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale_data",
    "sf1",
)
SFS = ["/root/testdata/sf0.1", SF1]

SUBSET = [
    "dq_psi_drift",
    "dq_psi_token_drift",
    "quality_nb_train",
    "quality_nb_score",
    "quality_ensemble_vote",
    "aug_span_corruption",
    "bpe_fertility",
    "mix_epoch_schedule",
    "dedup_substring_remove",
    "sim_recall_ivfpq",
    "pack_curriculum_shards",
    "emb_whitening",
    "doc_pagerank_winnow",
]


def main() -> None:
    import bench
    from getdbt_spark.queries import QUERIES, load_all
    from getdbt_spark.session import get_spark

    load_all()
    spark = get_spark(app_name="scaling_r10c")
    bench._warmup(spark, SFS[0])

    subset = sys.argv[1:] or SUBSET
    t: dict[str, list[float]] = {q: [] for q in subset}
    for sf_dir in SFS:
        if not os.path.isdir(sf_dir):
            print(f"missing {sf_dir}; run tools/gen_sf1.py first")
            return
        for q in subset:
            t0 = time.perf_counter()
            QUERIES[q](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            t[q].append(time.perf_counter() - t0)
            spark.catalog.clearCache()

    print("| query | t(sf0.1) s | t(sf1) s | α | verdict |")
    print("|---|---|---|---|---|")
    for q, ts in sorted(t.items(), key=lambda kv: -kv[1][-1]):
        a = math.log10(ts[1] / ts[0]) if ts[0] > 0 else float("nan")
        mark = "⚠" if a > 1.3 else "ok"
        print(f"| {q} | {ts[0]:.2f} | {ts[1]:.2f} | {a:+.2f} | {mark} |")


if __name__ == "__main__":
    main()
