"""Property tests for the round-10 training-pipeline operators
(queries/training_ops.py): structural invariants each operator's
definition promises, checked on the driver corpus at sf0.001."""

from __future__ import annotations

from collections import Counter

from getdbt_spark.queries import QUERIES, load_all

SF = "/root/testdata/sf0.001"

load_all()


def test_multiprobe_ann_dominates_single_probe(spark):
    """Query-side nprobe=2 widens the candidate set MONOTONICALLY, so
    for every (query, rank) present in both results the multiprobe
    k-th best cosine must be >= the single-probe k-th best."""
    mp = {
        (r["vec_id"], r["rnk"]): r["cos_sim"]
        for r in QUERIES["sim_ann_ivf_multiprobe"](spark, SF).collect()
    }
    sp = {
        (r["vec_id"], r["rnk"]): r["cos_sim"]
        for r in QUERIES["sim_ann_ivf_trained"](spark, SF).collect()
    }
    assert mp and sp
    assert len(mp) >= len(sp), "multiprobe returned fewer ranked rows"
    both = 0
    for key, sp_sim in sp.items():
        mp_sim = mp.get(key)
        if mp_sim is None or sp_sim is None:
            continue
        both += 1
        assert mp_sim >= sp_sim, (key, mp_sim, sp_sim)
    assert both > 0


def test_recall_multiprobe_invariants(spark):
    rows = {
        r["nprobe"]: r
        for r in QUERIES["sim_recall_multiprobe"](spark, SF).collect()
    }
    assert set(rows) == {1, 2}
    for r in rows.values():
        assert 0 <= r["n_hits"] <= 5 * r["n_queries"]
        assert 0.0 <= r["recall_at_5"] <= 1.0
    assert rows[2]["n_hits"] >= rows[1]["n_hits"]
    assert rows[2]["recall_at_5"] >= rows[1]["recall_at_5"]


def test_curriculum_order_is_total_and_staged(spark):
    """Ranks are the contiguous sequence 1..n, quality is
    non-increasing along the rank (cleanest first), stages are
    non-decreasing 1..4 with near-equal sizes (the exact integer
    quartile cut: sizes differ by at most 1)."""
    rows = sorted(
        QUERIES["sample_curriculum_order"](spark, SF).collect(),
        key=lambda r: r["curriculum_rank"],
    )
    assert rows
    n = len(rows)
    assert [r["curriculum_rank"] for r in rows] == list(range(1, n + 1))
    logits = [r["quality_logit"] for r in rows]
    assert all(a >= b for a, b in zip(logits, logits[1:]))
    stages = [r["stage"] for r in rows]
    assert set(stages) <= {1, 2, 3, 4}
    assert all(a <= b for a, b in zip(stages, stages[1:]))
    sizes = Counter(stages)
    assert max(sizes.values()) - min(sizes.values()) <= 1


def test_token_budget_allocation_is_exact_hamilton(spark):
    """The apportionment contract: allocations sum to the budget
    EXACTLY, and each domain's allocation is its exact quota floored
    or ceiled (the largest-remainder quota property)."""
    from getdbt_spark.queries.training_ops import ALLOC_BUDGET

    rows = QUERIES["mix_token_budget_allocation"](spark, SF).collect()
    assert rows
    assert sum(r["alloc_tokens"] for r in rows) == ALLOC_BUDGET
    # reconstruct the integer quotas from the emitted rounded weights:
    # |alloc - B*w| can drift by the rounding of w, so bound loosely
    for r in rows:
        quota = ALLOC_BUDGET * r["mix_weight"]
        assert quota - 1.01 <= r["alloc_tokens"] <= quota + 1.01, r


def test_ccnet_buckets_are_ordered_terciles_per_lang(spark):
    """Within each language: ranks contiguous, perplexity
    non-decreasing with rank, head < middle < tail in rank order,
    tercile sizes within 1 of each other."""
    from collections import defaultdict

    by_lang = defaultdict(list)
    for r in QUERIES["text_ccnet_buckets"](spark, SF).collect():
        by_lang[r["lang"]].append(r)
    assert by_lang
    order = {"head": 0, "middle": 1, "tail": 2}
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: r["ppl_rank_in_lang"])
        assert [r["ppl_rank_in_lang"] for r in rows] == list(
            range(1, len(rows) + 1)
        ), lang
        ppl = [r["avg_neg_log_p"] for r in rows]
        assert all(a <= b for a, b in zip(ppl, ppl[1:])), lang
        buckets = [order[r["bucket"]] for r in rows]
        assert all(a <= b for a, b in zip(buckets, buckets[1:])), lang
        sizes = Counter(buckets)
        assert max(sizes.values()) - min(sizes.values()) <= 1, lang
