"""Round-10 training-pipeline operators.

Operators a production pretraining-data pipeline runs between
curation and the trainer, each composing already-verified stages:

- ``sim_ann_ivf_multiprobe`` — IVF ANN search with query-side
  nprobe=2 (the recall dial ``sim_recall_at_k`` documents, wired);
- ``sim_recall_multiprobe`` — recall@5 of the trained IVF index at
  nprobe=1 and nprobe=2 against the exact top-5, one row per setting;
- ``sample_curriculum_order`` — deterministic quality-curriculum
  ordering of the kept training set (scale-safe global rank);
- ``mix_token_budget_allocation`` — exact integer Hamilton
  (largest-remainder) allocation of a token budget across source
  domains under the temperature-scaled mixture weights;
- ``text_ccnet_buckets`` — CCNet's head/middle/tail perplexity
  terciles per language;
- ``emb_pq_encode`` — product quantization (Jégou et al. 2011):
  per-subspace integer-exact codebooks + one code per subspace;
- ``sim_ann_ivfpq`` — the IVFPQ ANN stack: IVF cell candidates scored
  by asymmetric distance computation over the PQ codes, integer
  end-to-end.

Same conventions as the rest of the registry: portable hashing,
integer arithmetic wherever a float boundary could flip a verdict,
DuckDB oracles composed from the SAME registered oracle text as the
stages they reuse (``ORACLES[...]`` interpolation), identical column
aliases both sides.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import functions as E
from .. import pipeline as P
from . import ORACLES, query
from .pipeline_queries import (
    _COSINE_ORACLE_CORE,
    _docs,
    _embs,
    _km_dist_sql,
    _km_round_sql,
    sim_topk_cosine,
)

# ---------------------------------------------------------------------------
# IVF multiprobe ANN + its recall report
# ---------------------------------------------------------------------------

# Trained-codebook probe ranking, shared by both sim oracles below:
# identical trainer replay to the sim_ann_ivf_trained oracle, but
# ranked so consumers can bound the probe depth per side.
_SIM_PROBE_SQL = f"""
    qe AS (
      SELECT vec_id,
             [CAST(floor(x::DOUBLE * 1000000.0) AS BIGINT)
              for x in embedding] AS qv
      FROM embeddings
      WHERE isfinite(list_sum([abs(x::DOUBLE) for x in embedding]))
        AND len(list_filter(embedding, x -> x IS NULL)) = 0
    ), c0 AS (
      SELECT vec_id AS cent_id, qv AS cvec FROM qe WHERE vec_id < 8
    ),{_km_round_sql(1, 'c0')},{_km_round_sql(2, 'c1')},
    sfin AS (
      SELECT e2.vec_id, c.cent_id,
             {_km_dist_sql('e2.qv', 'c.cvec')} AS dist
      FROM qe e2, c2 c
    ), ranked AS (
      SELECT vec_id, cent_id,
             row_number() OVER (
               PARTITION BY vec_id ORDER BY dist, cent_id) AS rn
      FROM sfin
    )"""


@query(
    "sim_ann_ivf_multiprobe",
    oracle=_COSINE_ORACLE_CORE
    + f""",
    {_SIM_PROBE_SQL},
    af1 AS (SELECT vec_id, cent_id FROM ranked WHERE rn = 1),
    af2 AS (SELECT vec_id, cent_id FROM ranked WHERE rn <= 2),
    bucketed AS (
      SELECT p.vec_id, p.neighbor_id, p.c
      FROM p
      JOIN af2 qa ON qa.vec_id = p.vec_id
      JOIN af1 na ON na.vec_id = p.neighbor_id
       AND na.cent_id = qa.cent_id
    )
    SELECT vec_id, rnk, neighbor_id, cos_sim FROM (
      SELECT vec_id, neighbor_id, round(c, 6) AS cos_sim,
             row_number() OVER (
               PARTITION BY vec_id ORDER BY c DESC, neighbor_id) AS rnk
      FROM bucketed) WHERE rnk <= 5
    """,
)
def sim_ann_ivf_multiprobe(spark, sf_dir):
    """``sim_ann_ivf_trained`` with the standard IVF recall dial
    wired: each QUERY probes its TWO nearest trained cells while every
    INDEX vector stays in exactly one cell (the classic multiprobe
    asymmetry — candidates cannot duplicate because the index side is
    single-homed, so no distinct is needed), and the top-5 ranks over
    the widened candidate set.

    Same trainer, quantization, tie-breaks and cosine contract as the
    single-probe variant (shared ``kmeans_probe_assign`` helpers and
    oracle text); candidate mass is ≤ 2× single-probe and still
    Σ|cell|-bounded per query.  ``sim_recall_multiprobe`` reports the
    recall this buys.  Scale shape: the probe table is (2 rows ×
    vectors), the search an equi-join on cent_id — hash-partitioned,
    never all-pairs; one vec_id window takes the top-5 (planned as
    WindowGroupLimit, a per-partition partial top-k before the
    shuffle).

    Both pair-scan sides derive from ONE persisted embedding⋈probe
    frame, exactly like ``sim_ann_ivf_trained``'s ``ea`` — with two
    lazy sides the trainer lineage (codebook rounds + assignment
    window) re-executed per side and the join planned against
    unmaterialized estimates: measured 103 s vs 20 s at sf1 (the r10
    decade find; single-probe is 16.6 s, so the shared-cache shape is
    the expected ≈1.2× — the 5× was pure recomputation).
    """
    from pyspark.sql import Window

    e = P.with_norm(_embs(spark, sf_dir))
    probes = P.kmeans_probe_assign(e, k=8, iters=2, nprobe=2)
    ep = e.join(probes, "vec_id").persist()
    qa = ep.select(
        "cent_id",
        "vec_id",
        F.col("embedding").alias("va"),
        F.col("norm").alias("na"),
    )
    na = ep.filter(F.col("probe_rank") == 1).select(
        "cent_id",
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("vb"),
        F.col("norm").alias("nb"),
    )
    pairs = (
        qa.join(na, "cent_id")
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select(
            "vec_id",
            "neighbor_id",
            P.cosine(
                F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
            ).alias("c"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("c"), F.asc("neighbor_id")
    )
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            "vec_id",
            "rnk",
            "neighbor_id",
            E.round_to(F.col("c"), 6).alias("cos_sim"),
        )
    )


@query(
    "sim_recall_multiprobe",
    oracle=_COSINE_ORACLE_CORE
    + f""",
    {_SIM_PROBE_SQL},
    af1 AS (SELECT vec_id, cent_id FROM ranked WHERE rn = 1),
    af2 AS (SELECT vec_id, cent_id FROM ranked WHERE rn <= 2),
    exact5 AS (
      SELECT vec_id, neighbor_id FROM (
        SELECT vec_id, neighbor_id,
               row_number() OVER (
                 PARTITION BY vec_id ORDER BY c DESC, neighbor_id) AS rnk
        FROM p) WHERE rnk <= 5
    ), iv5 AS (
      SELECT vec_id, neighbor_id FROM (
        SELECT p.vec_id, p.neighbor_id,
               row_number() OVER (
                 PARTITION BY p.vec_id ORDER BY p.c DESC, p.neighbor_id)
                 AS rnk
        FROM p
        JOIN af1 qa ON qa.vec_id = p.vec_id
        JOIN af1 na ON na.vec_id = p.neighbor_id
         AND na.cent_id = qa.cent_id) WHERE rnk <= 5
    ), mp5 AS (
      SELECT vec_id, neighbor_id FROM (
        SELECT p.vec_id, p.neighbor_id,
               row_number() OVER (
                 PARTITION BY p.vec_id ORDER BY p.c DESC, p.neighbor_id)
                 AS rnk
        FROM p
        JOIN af2 qa ON qa.vec_id = p.vec_id
        JOIN af1 na ON na.vec_id = p.neighbor_id
         AND na.cent_id = qa.cent_id) WHERE rnk <= 5
    ), nq AS (SELECT count(DISTINCT vec_id) AS n FROM e)
    SELECT 1::BIGINT AS nprobe,
           (SELECT n FROM nq)::BIGINT AS n_queries,
           (SELECT count(*) FROM iv5 JOIN exact5
              USING (vec_id, neighbor_id))::BIGINT AS n_hits,
           round((SELECT count(*) FROM iv5 JOIN exact5
                  USING (vec_id, neighbor_id))::DOUBLE
                 / (5 * (SELECT n FROM nq)), 6) AS recall_at_5
    UNION ALL
    SELECT 2::BIGINT, (SELECT n FROM nq)::BIGINT,
           (SELECT count(*) FROM mp5 JOIN exact5
              USING (vec_id, neighbor_id))::BIGINT,
           round((SELECT count(*) FROM mp5 JOIN exact5
                  USING (vec_id, neighbor_id))::DOUBLE
                 / (5 * (SELECT n FROM nq)), 6)
    """,
)
def sim_recall_multiprobe(spark, sf_dir):
    """Recall@5 of the TRAINED IVF index at nprobe=1 and nprobe=2
    against the exact brute-force top-5 — one row per probe depth,
    quantifying exactly what the multiprobe dial buys
    (``sim_recall_at_k``'s metric, applied to the trained-codebook
    family it left unmeasured).

    Composes three independently hash-verified builders
    (``sim_topk_cosine``, ``sim_ann_ivf_trained``,
    ``sim_ann_ivf_multiprobe``); hits are an aggregate-grain join on
    (query, neighbor), so the evaluation costs a fraction of either
    index build at any corpus size.  Missing neighbors count against
    recall, per the standard definition.
    """
    from .pipeline_queries import sim_ann_ivf_trained

    exact5 = (
        sim_topk_cosine(spark, sf_dir)
        .filter(F.col("rnk") <= 5)
        .select("vec_id", "neighbor_id")
        .localCheckpoint()
    )
    e = _embs(spark, sf_dir)
    n_queries = e.select("vec_id").distinct().count()
    rows = []
    for nprobe, builder in (
        (1, sim_ann_ivf_trained),
        (2, sim_ann_ivf_multiprobe),
    ):
        n_hits = (
            builder(spark, sf_dir)
            .select("vec_id", "neighbor_id")
            .join(exact5, ["vec_id", "neighbor_id"])
            .count()
        )
        rows.append((nprobe, n_queries, n_hits))
    out = spark.createDataFrame(
        rows, "nprobe long, n_queries long, n_hits long"
    )
    return out.select(
        "nprobe",
        "n_queries",
        "n_hits",
        E.round_to(
            F.col("n_hits").cast("double")
            / (F.lit(5) * F.col("n_queries")),
            6,
        ).alias("recall_at_5"),
    )


# ---------------------------------------------------------------------------
# Curriculum ordering
# ---------------------------------------------------------------------------


def _curriculum_oracle() -> str:
    return f"""
    WITH q AS ({ORACLES['quality_logreg_score']}),
    k AS (SELECT doc_id, quality_logit FROM q WHERE keep),
    n AS (SELECT count(*) AS n FROM k),
    r AS (
      SELECT doc_id, quality_logit,
             row_number() OVER (
               ORDER BY quality_logit DESC, doc_id) AS curriculum_rank
      FROM k
    )
    SELECT doc_id, quality_logit,
           curriculum_rank::BIGINT AS curriculum_rank,
           (((curriculum_rank - 1) * 4) // n.n + 1)::BIGINT AS stage
    FROM r, n
    """


@query("sample_curriculum_order", oracle=_curriculum_oracle())
def sample_curriculum_order(spark, sf_dir):
    """Deterministic quality-curriculum ordering of the TRAINING SET:
    the kept documents (``quality_logreg_score``'s keep verdict),
    globally ranked cleanest-first by the rounded quality logit
    (doc_id tie-break — a total order), and cut into four curriculum
    stages by exact integer arithmetic (``((rank-1)·4) div n + 1`` —
    no ntile, whose uneven-group boundary differs across engines).

    The global rank is DATA-SIZED (document grain), so it uses
    ``functions.with_global_rank`` — range repartition, per-slice
    Arrow local ranks, driver-side slice offsets, broadcast join —
    never a single-task unpartitioned window (the r8/r9
    global-window scale class).  The stage boundary needs n, one
    bounded scalar anchor.

    Curriculum scheduling (easy→hard by a cleanliness proxy) is a
    standard pretraining data-order lever; this operator emits the
    order as a materializable table the packer/loader consumes, which
    is how a 100 TB run actually implements it (sort once, shard in
    rank order).
    """
    from .curation import quality_logreg_score

    kept = quality_logreg_score(spark, sf_dir).filter(F.col("keep")).select(
        "doc_id", "quality_logit"
    )
    n = kept.count()
    ranked = E.with_global_rank(
        kept,
        order=[F.desc("quality_logit"), F.asc("doc_id")],
        rank_col="curriculum_rank",
    )
    return ranked.select(
        "doc_id",
        "quality_logit",
        F.col("curriculum_rank").cast("long").alias("curriculum_rank"),
        F.expr(
            f"CAST((curriculum_rank - 1) * 4 DIV {n} + 1 AS BIGINT)"
        ).alias("stage"),
    )


# ---------------------------------------------------------------------------
# Exact integer token-budget allocation (Hamilton / largest remainder)
# ---------------------------------------------------------------------------

ALLOC_BUDGET = 1_000_000  # tokens to allocate across source domains


@query(
    "mix_token_budget_allocation",
    oracle=f"""
    WITH s AS (
      SELECT source, count(*) AS n_docs,
             sum(len(string_split(lower(text), ' ')))::BIGINT AS n_tokens
      FROM documents GROUP BY source
    ), t AS (
      SELECT *, (SELECT sum(n_tokens) FROM s) AS tot FROM s
    ), q AS (
      SELECT source, n_tokens,
             CAST(floor(sqrt(n_tokens / tot) * 1000000) AS BIGINT)
               AS micro_w
      FROM t
    ), nrm AS (
      SELECT *, (SELECT sum(micro_w) FROM q) AS norm FROM q
    ), base AS (
      SELECT source, n_tokens, micro_w, norm,
             ({ALLOC_BUDGET} * micro_w) // norm AS base_alloc,
             ({ALLOC_BUDGET} * micro_w) % norm AS rem
      FROM nrm
    ), ranked AS (
      SELECT *,
             row_number() OVER (ORDER BY rem DESC, source) AS rem_rank,
             (SELECT {ALLOC_BUDGET} - sum(base_alloc) FROM base)
               AS shortfall
      FROM base
    )
    SELECT source, n_tokens,
           round(micro_w / norm, 6) AS mix_weight,
           (base_alloc
            + CASE WHEN rem_rank <= shortfall THEN 1 ELSE 0 END)::BIGINT
             AS alloc_tokens
    FROM ranked
    """,
)
def mix_token_budget_allocation(spark, sf_dir):
    """EXACT integer allocation of a fixed token budget across source
    domains under the temperature-scaled mixture
    (``mix_domain_weights``'s α=0.5 weights): Hamilton /
    largest-remainder apportionment — floor the proportional share,
    then give the leftover tokens to the largest remainders
    (deterministic source tie-break).  Σ alloc_tokens == BUDGET
    exactly, which is the property a shard planner needs (floats
    "summing to ~1" lose or invent tokens at the boundary).

    Entirely integer arithmetic on BOTH engines: the quantized weight
    ``micro_w`` and its normalizer are the same order-free integers
    ``mix_domain_weights`` builds; shares divide as
    ``(B·micro_w) div norm`` with the remainder compared as
    ``(B·micro_w) mod norm`` — no float crosses a verdict boundary
    anywhere (B·micro_w ≤ 1e12 — far inside BIGINT).

    Scale: one map-combinable groupBy(source); every window runs over
    the source-domain grain — catalog-bounded by construction, the
    GLOBAL_WINDOW_ALLOW category (b) shape, same as
    ``mix_domain_weights`` itself.
    """
    from pyspark.sql import Window

    d = _docs(spark, sf_dir)
    s = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.lower(F.col("text")), " ")))
        .cast("long")
        .alias("n_tokens"),
    )
    w_all = Window.partitionBy()
    t = s.withColumn("tot", F.sum("n_tokens").over(w_all))
    q = t.withColumn(
        "micro_w",
        F.floor(F.sqrt(F.col("n_tokens") / F.col("tot")) * 1000000).cast(
            "long"
        ),
    )
    nrm = q.withColumn("norm", F.sum("micro_w").over(w_all))
    base = nrm.withColumn(
        "base_alloc",
        F.expr(f"CAST({ALLOC_BUDGET} * micro_w DIV norm AS BIGINT)"),
    ).withColumn(
        "rem", F.expr(f"CAST({ALLOC_BUDGET} * micro_w % norm AS BIGINT)")
    )
    ranked = base.withColumn(
        "rem_rank",
        F.row_number().over(Window.orderBy(F.desc("rem"), F.asc("source"))),
    ).withColumn(
        "shortfall",
        F.lit(ALLOC_BUDGET) - F.sum("base_alloc").over(w_all),
    )
    return ranked.select(
        "source",
        "n_tokens",
        E.round_to(F.col("micro_w") / F.col("norm"), 6).alias("mix_weight"),
        (
            F.col("base_alloc")
            + F.when(F.col("rem_rank") <= F.col("shortfall"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc_tokens"),
    )


# ---------------------------------------------------------------------------
# CCNet perplexity buckets
# ---------------------------------------------------------------------------


def _ccnet_oracle() -> str:
    return f"""
    WITH ppl AS ({ORACLES['text_perplexity_proxy']}),
    j AS (
      SELECT ppl.doc_id, d.lang, ppl.avg_neg_log_p
      FROM ppl JOIN documents d ON d.doc_id = ppl.doc_id
    ), r AS (
      SELECT doc_id, lang, avg_neg_log_p,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY avg_neg_log_p, doc_id) AS ppl_rank_in_lang,
             count(*) OVER (PARTITION BY lang) AS n_lang
      FROM j
    )
    SELECT doc_id, lang, avg_neg_log_p,
           ppl_rank_in_lang::BIGINT AS ppl_rank_in_lang,
           CASE ((ppl_rank_in_lang - 1) * 3) // n_lang
             WHEN 0 THEN 'head' WHEN 1 THEN 'middle' ELSE 'tail'
           END AS bucket
    FROM r
    """


@query("text_ccnet_buckets", oracle=_ccnet_oracle())
def text_ccnet_buckets(spark, sf_dir):
    """CCNet's head/middle/tail split: per LANGUAGE, rank documents by
    unigram perplexity (``text_perplexity_proxy``'s micro-nat exact
    surprisal) ascending and cut exact terciles — head is the lowest
    third (cleanest), tail the highest (noisiest), the split CCNet
    publishes and downstream filters key on.

    Terciles by exact integer arithmetic (``((rank-1)·3) div n_lang``)
    — not ntile, whose uneven-group boundary is engine-specific; the
    rank's (perplexity, doc_id) order is total because the perplexity
    is an order-free integer micro-nat mean rounded to 6 decimals on
    both engines.

    Scale: composes the verified perplexity stage (two shuffles) plus
    ONE lang-partitioned window — partitioned, never global; language
    cardinality is catalog-bounded and per-lang rank state is
    data-sized only within a partition, the same shape as
    ``pack_token_budget``'s packing window.
    """
    from pyspark.sql import Window

    from .pipeline_queries import text_perplexity_proxy

    ppl = text_perplexity_proxy(spark, sf_dir).select(
        "doc_id", "avg_neg_log_p"
    )
    d = _docs(spark, sf_dir).select("doc_id", "lang")
    j = ppl.join(d, "doc_id")
    w = Window.partitionBy("lang").orderBy("avg_neg_log_p", "doc_id")
    w_n = Window.partitionBy("lang")
    r = j.withColumn(
        "ppl_rank_in_lang", F.row_number().over(w).cast("long")
    ).withColumn("n_lang", F.count("*").over(w_n))
    bucket_idx = F.expr("(ppl_rank_in_lang - 1) * 3 DIV n_lang")
    return r.select(
        "doc_id",
        "lang",
        "avg_neg_log_p",
        "ppl_rank_in_lang",
        F.when(bucket_idx == 0, "head")
        .when(bucket_idx == 1, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


# ---------------------------------------------------------------------------
# Product quantization
# ---------------------------------------------------------------------------

PQ_SUBSPACES = 4   # M: subvectors per embedding
PQ_SUBDIMS = 16    # dims per subspace (M * SUBDIMS == 64, the corpus dim)
PQ_K = 4           # codebook size per subspace


def _pq_oracle() -> str:
    chains, outs = [], []
    for m in range(PQ_SUBSPACES):
        lo, hi = m * PQ_SUBDIMS + 1, (m + 1) * PQ_SUBDIMS
        pfx = f"pq{m}"
        chains.append(
            f"""
    qe{m} AS (
      -- whole-vector validity (one corrupt component voids ALL of a
      -- vector's codes, keeping the vec set identical across
      -- subspaces), then the subspace slice is quantized
      SELECT vec_id,
             [CAST(floor(x::DOUBLE * 1000000.0) AS BIGINT)
              for x in embedding[{lo}:{hi}]] AS qv
      FROM embeddings
      WHERE isfinite(list_sum([abs(x::DOUBLE) for x in embedding]))
        AND len(list_filter(embedding, x -> x IS NULL)) = 0
    ), {pfx}c0 AS (
      SELECT vec_id AS cent_id, qv AS cvec FROM qe{m}
      WHERE vec_id < {PQ_K}
    ),{_km_round_sql(1, f'{pfx}c0', qe=f'qe{m}', dims=PQ_SUBDIMS, pfx=pfx)},
    {_km_round_sql(2, f'{pfx}c1', qe=f'qe{m}', dims=PQ_SUBDIMS, pfx=pfx)},
    {pfx}f AS (
      SELECT e2.vec_id, c.cent_id,
             {_km_dist_sql('e2.qv', 'c.cvec')} AS dist
      FROM qe{m} e2, {pfx}c2 c
    ), {pfx}out AS (
      SELECT vec_id, {m}::BIGINT AS subspace, cent_id AS code,
             dist AS dist_q
      FROM (
        SELECT vec_id, cent_id, dist,
               row_number() OVER (
                 PARTITION BY vec_id ORDER BY dist, cent_id) AS rn
        FROM {pfx}f) WHERE rn = 1
    )"""
        )
        outs.append(f"SELECT * FROM {pfx}out")
    return (
        "WITH " + ",".join(chains) + "\n" + "\nUNION ALL\n".join(outs)
    )


@query("emb_pq_encode", oracle=_pq_oracle())
def emb_pq_encode(spark, sf_dir):
    """Product quantization (Jégou et al. 2011) — THE ANN compression
    every 100 TB vector store runs: split each embedding into
    ``PQ_SUBSPACES`` subvectors, train an independent integer-exact
    k-means codebook per subspace (same trainer, init and tie-breaks
    as ``emb_kmeans_train`` — bit-reproducible, SQL-replayable), and
    encode every vector as one code per subspace.  Storage drops from
    64 floats to M small codes; ``dist_q`` is the per-subspace
    quantization error (its sum over a vector's rows is the total
    reconstruction error, the metric that tunes M and K).

    Validity is whole-vector: one corrupt component voids ALL of a
    vector's codes, keeping the encoded vec set identical across
    subspaces (a per-slice filter would give a vector codes in some
    subspaces only — unreconstructable).

    Scale shape: M independent trainers, each the bounded-codebook
    BroadcastNestedLoopJoin pattern over a SLICED projection (16 of
    64 dims — each trainer moves a quarter of the column); the final
    union is M map-side projections.  At deployment the codebooks are
    trained on a sample and shipped as artifacts; the encode pass is
    one broadcast fan-out per subspace, embarrassingly parallel.
    """
    from functools import reduce

    e = _embs(spark, sf_dir).filter(P.finite_vec("embedding"))
    parts = []
    for m in range(PQ_SUBSPACES):
        sub = e.select(
            "vec_id",
            F.slice(
                "embedding", m * PQ_SUBDIMS + 1, PQ_SUBDIMS
            ).alias("embedding"),
        )
        q = P._kmeans_quantize_valid(sub)
        cents = P._kmeans_train(q, PQ_K, 2)
        a = P._kmeans_assign(q, cents)
        parts.append(
            a.select(
                "vec_id",
                F.lit(m).cast("long").alias("subspace"),
                F.col("cent_id").alias("code"),
                F.col("dist").alias("dist_q"),
            )
        )
    return reduce(lambda x, y: x.unionByName(y), parts)


def _ivfpq_oracle() -> str:
    pq_chains, luts, codes = [], [], []
    for m in range(PQ_SUBSPACES):
        lo, hi = m * PQ_SUBDIMS + 1, (m + 1) * PQ_SUBDIMS
        pfx = f"pq{m}"
        pq_chains.append(
            f"""
    qe{m} AS (
      SELECT vec_id,
             [CAST(floor(x::DOUBLE * 1000000.0) AS BIGINT)
              for x in embedding[{lo}:{hi}]] AS qv
      FROM embeddings
      WHERE isfinite(list_sum([abs(x::DOUBLE) for x in embedding]))
        AND len(list_filter(embedding, x -> x IS NULL)) = 0
    ), {pfx}c0 AS (
      SELECT vec_id AS cent_id, qv AS cvec FROM qe{m}
      WHERE vec_id < {PQ_K}
    ),{_km_round_sql(1, f'{pfx}c0', qe=f'qe{m}', dims=PQ_SUBDIMS, pfx=pfx)},
    {_km_round_sql(2, f'{pfx}c1', qe=f'qe{m}', dims=PQ_SUBDIMS, pfx=pfx)},
    lut{m} AS (
      SELECT e2.vec_id, {m}::BIGINT AS subspace, c.cent_id AS code,
             {_km_dist_sql('e2.qv', 'c.cvec')} AS dist
      FROM qe{m} e2, {pfx}c2 c
    ), code{m} AS (
      SELECT vec_id, subspace, code FROM (
        SELECT vec_id, subspace, code,
               row_number() OVER (
                 PARTITION BY vec_id ORDER BY dist, code) AS rn
        FROM lut{m}) WHERE rn = 1
    )"""
        )
        luts.append(f"SELECT * FROM lut{m}")
        codes.append(f"SELECT * FROM code{m}")
    lut_union = "\nUNION ALL\n".join(luts)
    code_union = "\nUNION ALL\n".join(codes)
    return f"""
    WITH {_SIM_PROBE_SQL},
    af AS (SELECT vec_id, cent_id FROM ranked WHERE rn = 1),
    {",".join(pq_chains)},
    lut AS ({lut_union}),
    codes AS ({code_union}),
    cand AS (
      SELECT a.vec_id, b.vec_id AS neighbor_id
      FROM af a JOIN af b
        ON a.cent_id = b.cent_id AND a.vec_id <> b.vec_id
    ), j AS (
      SELECT cand.vec_id, cand.neighbor_id, c.subspace, c.code
      FROM cand JOIN codes c ON c.vec_id = cand.neighbor_id
    ), s AS (
      SELECT j.vec_id, j.neighbor_id,
             CAST(sum(l.dist) AS BIGINT) AS adc_dist
      FROM j JOIN lut l
        ON l.vec_id = j.vec_id AND l.subspace = j.subspace
       AND l.code = j.code
      GROUP BY j.vec_id, j.neighbor_id
    )
    SELECT vec_id, rnk, neighbor_id, adc_dist FROM (
      SELECT vec_id, neighbor_id, adc_dist,
             row_number() OVER (
               PARTITION BY vec_id ORDER BY adc_dist, neighbor_id) AS rnk
      FROM s) WHERE rnk <= 5
    """


@query("sim_ann_ivfpq", oracle=_ivfpq_oracle())
def sim_ann_ivfpq(spark, sf_dir):
    """IVFPQ — the memory-bounded ANN production stack (Jégou et al.
    2011; the FAISS default at billion scale): IVF restricts
    candidates to the query's trained cell, and each candidate's
    distance is computed from its PRODUCT-QUANTIZED codes via
    asymmetric distance computation (ADC) — a table lookup per
    subspace instead of a 64-dim dot product, against codes that are
    ~32× smaller than the raw vectors.  That two-level structure is
    what lets a 100 TB corpus keep its whole index in memory.

    Everything is INTEGER end-to-end: the IVF cells, the per-subspace
    codebooks, the per-(query, code) lookup tables, and the summed
    ADC distance all ride the micro-unit quantized trainer, so the
    DuckDB oracle replays the full stack bit-for-bit — no float
    enters until nothing is left to compare.

    Scale shape: codebook training is the bounded-BNLJ pattern (one
    IVF trainer + M subspace trainers over sliced projections); the
    lookup table is (vectors × K × M) rows — LINEAR in the corpus,
    built by one broadcast fan-out per subspace; the search is
    equi-joins on (cent_id) and (vec_id, subspace, code) plus one
    map-combinable 4-row groupBy per candidate pair.  ADC recall
    tracks ``sim_recall_multiprobe``'s IVF numbers minus quantization
    loss — tune M/K (and nprobe, composable with
    ``kmeans_probe_assign``) against it.
    """
    from functools import reduce

    from pyspark.sql import Window

    e = _embs(spark, sf_dir).filter(P.finite_vec("embedding"))
    # IVF cells (full-vector trained codebook, single-homed)
    qfull = P._kmeans_quantize_valid(e)
    cell = (
        P._kmeans_assign(qfull, P._kmeans_train(qfull, 8, 2))
        .select("vec_id", "cent_id")
        .persist()
    )
    # per-subspace LUTs: distance of every vector's subvector to EVERY
    # codebook entry (K rows per vector per subspace); codes = argmin
    lut_parts = []
    for m in range(PQ_SUBSPACES):
        sub = e.select(
            "vec_id",
            F.slice(
                "embedding", m * PQ_SUBDIMS + 1, PQ_SUBDIMS
            ).alias("embedding"),
        )
        qm = P._kmeans_quantize_valid(sub)
        lut_parts.append(
            P._kmeans_assign(
                qm, P._kmeans_train(qm, PQ_K, 2), nprobe=PQ_K
            ).select(
                "vec_id",
                F.lit(m).cast("long").alias("subspace"),
                F.col("cent_id").alias("code"),
                "dist",
                "probe_rank",
            )
        )
    lut = reduce(lambda x, y: x.unionByName(y), lut_parts).persist()
    codes = lut.filter(F.col("probe_rank") == 1).select(
        F.col("vec_id").alias("neighbor_id"), "subspace", "code"
    )
    ca = cell.select("vec_id", "cent_id")
    cb = cell.select(F.col("vec_id").alias("neighbor_id"), "cent_id")
    cand = ca.join(cb, "cent_id").filter(
        F.col("vec_id") != F.col("neighbor_id")
    )
    j = cand.select("vec_id", "neighbor_id").join(codes, "neighbor_id")
    s = (
        j.join(
            lut.select("vec_id", "subspace", "code", "dist"),
            ["vec_id", "subspace", "code"],
        )
        .groupBy("vec_id", "neighbor_id")
        .agg(F.sum("dist").cast("long").alias("adc_dist"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        s.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("vec_id", "rnk", "neighbor_id", "adc_dist")
    )
