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


def _write_embs(spark, tmp_path_factory, name, vecs):
    out = str(tmp_path_factory.mktemp(name))
    rows = [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{out}/embeddings.parquet")
    return out


def test_pq_encode_codes_and_reconstruction(spark, tmp_path_factory):
    """Planted truth on a 64-dim corpus built from 4 distinct
    16-dim subspace patterns: every vector gets exactly one code per
    subspace; identical subvectors get identical codes; a vector that
    EQUALS a codebook centroid's pattern in some subspace has
    dist_q == 0 there; a corrupt (NaN) vector gets no codes at all."""
    import math

    # vecs 0..3 are the init centroids; vec 4 copies vec 1 exactly;
    # vec 5 is vec 2 with noise in subspace 0 only; vec 6 is corrupt
    base = []
    for i in range(4):
        v = [0.0] * 64
        for m in range(4):
            v[m * 16 + (i % 16)] = float(i + 1)
        base.append(v)
    vecs = base + [list(base[1]), list(base[2]), [math.nan] * 64]
    vecs[5][0] += 0.5  # subspace-0 perturbation only
    sf = _write_embs(spark, tmp_path_factory, "pq_sf", vecs)
    rows = QUERIES["emb_pq_encode"](spark, sf).collect()
    by_vec = {}
    for r in rows:
        by_vec.setdefault(r["vec_id"], {})[r["subspace"]] = r
    assert 6 not in by_vec, "corrupt vector must get no codes"
    for vid, subs in by_vec.items():
        assert set(subs) == {0, 1, 2, 3}, vid
    # exact copy -> identical codes everywhere, zero error where the
    # subvector IS a trained centroid pattern
    for m in range(4):
        assert by_vec[4][m]["code"] == by_vec[1][m]["code"]
        assert by_vec[4][m]["dist_q"] == by_vec[1][m]["dist_q"]
    # perturbed only in subspace 0: subspaces 1..3 match vec 2 exactly
    for m in range(1, 4):
        assert by_vec[5][m]["code"] == by_vec[2][m]["code"]
        assert by_vec[5][m]["dist_q"] == by_vec[2][m]["dist_q"]


def test_ivfpq_adc_ranks_planted_duplicates_first(spark, tmp_path_factory):
    """A planted duplicate pair must rank each other at ADC rank 1
    with adc_dist 0 (identical codes in every subspace); every row
    carries a non-negative integer ADC distance and ranks are
    contiguous from 1 per query."""
    base = []
    for i in range(8):
        v = [0.0] * 64
        v[i * 8] = 1.0 + 0.1 * i
        base.append(v)
    vecs = base + [list(base[1]), list(base[1])]  # 8, 9 duplicate 1
    sf = _write_embs(spark, tmp_path_factory, "ivfpq_sf", vecs)
    rows = QUERIES["sim_ann_ivfpq"](spark, sf).collect()
    assert rows
    by_q = {}
    for r in rows:
        assert r["adc_dist"] >= 0
        by_q.setdefault(r["vec_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rnk"])
        assert [r["rnk"] for r in rs] == list(range(1, len(rs) + 1)), q
    # the duplicate trio share cells and codes: distance 0 to each other
    assert by_q[8][0]["adc_dist"] == 0
    assert by_q[8][0]["neighbor_id"] in (1, 9)
    assert by_q[9][0]["adc_dist"] == 0
