"""dq.py — the ``dbt test`` surface: dbt's four generic column tests
with dbt's exact failure-counting semantics (duplicated VALUES for
unique, distinct offending values for accepted_values, NULL-exempt
foreign keys for relationships)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from getdbt_spark.dq import declared_tests, run_dq
from getdbt_spark.registry import DQTest, Model, ModelConfig
from getdbt_spark.runner import Runner

D = dt.date(2024, 3, 20)


def _mk_model(name, builder, dq_tests=(), refs=(), sources=()):
    return Model(
        name=name,
        builder=builder,
        refs=tuple(refs),
        sources=tuple(sources),
        config=ModelConfig(),
        dq_tests=tuple(dq_tests),
    )


@pytest.fixture(scope="module")
def dq_result(spark):
    child = spark.createDataFrame(
        [
            (1, "A", 10),
            (2, "A", None),
            (2, "B", 30),
            (3, "WEIRD", 40),
            (3, "ALSO_WEIRD", 50),
            (None, "B", 60),
            (9, None, 70),
        ],
        "k int, cat string, v int",
    )
    parent = spark.createDataFrame([(1,), (2,), (5,)], "pk int")
    reg = {
        "child": _mk_model(
            "child",
            lambda ctx: ctx.source("raw", "child"),
            sources=[("raw", "child")],
            dq_tests=[
                DQTest("not_null", "k"),
                DQTest("unique", "k"),
                DQTest("accepted_values", "cat", values=("A", "B")),
                DQTest(
                    "relationships", "k", to="parent", to_field="pk"
                ),
            ],
        ),
        "parent": _mk_model(
            "parent",
            lambda ctx: ctx.source("raw", "parent"),
            sources=[("raw", "parent")],
        ),
    }
    r = Runner(
        spark,
        {("raw", "child"): child, ("raw", "parent"): parent},
        D,
        registry=reg,
    )
    rows = run_dq(r).collect()
    return {(x.test_kind, x.column_name): x.n_failures for x in rows}


def test_not_null_counts_null_rows(dq_result):
    assert dq_result[("not_null", "k")] == 1


def test_unique_counts_duplicated_values_not_rows(dq_result):
    # k=2 twice, k=3 twice -> 2 duplicated values (dbt), not 4 rows.
    assert dq_result[("unique", "k")] == 2


def test_accepted_values_counts_distinct_offenders_null_exempt(dq_result):
    # WEIRD + ALSO_WEIRD; the NULL cat never fails accepted_values.
    assert dq_result[("accepted_values", "cat")] == 2


def test_relationships_counts_orphan_rows_null_exempt(dq_result):
    # k in {3,3,9} have no parent; NULL k is exempt -> 3 orphan rows.
    assert dq_result[("relationships", "k")] == 3


def test_declared_tests_deterministic_order():
    reg = {
        "b": _mk_model("b", lambda c: None, dq_tests=[DQTest("not_null", "x")]),
        "a": _mk_model("a", lambda c: None, dq_tests=[DQTest("unique", "y")]),
    }
    assert [(n, t.kind) for n, t in declared_tests(reg)] == [
        ("a", "unique"),
        ("b", "not_null"),
    ]


def test_bad_declarations_rejected():
    with pytest.raises(ValueError):
        DQTest("nope", "x")
    with pytest.raises(ValueError):
        DQTest("accepted_values", "x")
    with pytest.raises(ValueError):
        DQTest("relationships", "x", to="p")


def test_empty_scope_raises(spark):
    reg = {"m": _mk_model("m", lambda c: None)}
    r = Runner(spark, {}, D, registry=reg)
    with pytest.raises(ValueError, match="no dq tests"):
        run_dq(r)


def test_table_diff_counts_adds_drops_and_value_changes(spark):
    """Perturb a copy (2 updates, 1 delete, 2 adds) — the report must
    localize exactly which column changed and by how many rows."""
    from getdbt_spark.dq import table_diff

    a = spark.createDataFrame(
        [(i, f"v{i}", i * 10) for i in range(10)], ["k", "s", "n"]
    )
    b = spark.createDataFrame(
        [
            (i, "CHANGED" if i in (3, 5) else f"v{i}", i * 10)
            for i in range(10)
            if i != 7  # dropped
        ]
        + [(100, "new", 0), (101, "new", 0)],  # added
        ["k", "s", "n"],
    )
    rows = {r.column: r for r in table_diff(a, b, ["k"]).collect()}
    assert set(rows) == {"s", "n"}
    for r in rows.values():
        assert (r.n_only_a, r.n_only_b, r.n_common) == (1, 2, 9)
    assert rows["s"].n_value_diff == 2
    assert rows["n"].n_value_diff == 0


def test_degenerate_probe_battery_semantics(spark):
    """The driver-visible degenerate battery (VERDICT r9 #7): empty
    corpus → every operator yields zero rows without crashing;
    all-NULL documents → per-doc operators keep doc grain (NULL text
    ≡ empty text), dedup_exact collapses to ONE all-NULL fingerprint
    group, and token-feed operators yield nothing (no tokens, no
    buckets, no shingles)."""
    from getdbt_spark.queries import QUERIES, load_all

    load_all()
    rows = {
        (r["probe"], r["operator"]): r["n_rows"]
        for r in QUERIES["dq_degenerate_probe"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert len(rows) == 37
    n_docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).count()
    n_vecs = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).count()
    for (probe, op), n in rows.items():
        if probe == "empty":
            assert n == 0, (op, n)
    # round-11 probes (VERDICT r10 #6): degenerate matrices keep
    # their grain — constant dims whiten to NULL z at cell grain,
    # zero/constant matrices still emit the 64-dim direction (all
    # zeros after the m == 0 cutoff); the single-source catalog
    # collapses both Hamilton allocators to one row holding the
    # whole budget; the edgeless (all-NULL-text) graph keeps doc
    # grain with every doc dangling.
    for probe in ("constemb", "zeroemb"):
        assert rows[(probe, "emb_whitening")] == n_vecs * 64
        assert rows[(probe, "emb_pca_power_iteration")] == 64
    for op in ("mix_epoch_schedule", "mix_token_budget_allocation"):
        assert rows[("onesrc", op)] == 1
    assert rows[("nulldoc", "doc_pagerank_winnow")] == n_docs
    for op in ("text_token_stats", "text_quality_score", "text_langid"):
        assert rows[("nulldoc", op)] == n_docs, op
    assert rows[("nulldoc", "dedup_exact")] == 1
    assert rows[("nulldoc", "dedup_minhash_lsh")] == 0
    assert rows[("nulldoc", "dsir_importance_weights")] == 0
    # trained artifact over a degenerate corpus: no tokens -> empty
    # vocabulary, every doc scored at the prior (doc grain preserved)
    assert rows[("nulldoc", "quality_nb_score")] == n_docs
    # round-12 probe rows: the deployment ANN stack.  zeroemb (the
    # corpus where every norm is zero — this round's DIVIDE_BY_ZERO
    # find) drops every vector and emits an EMPTY verdict, no abort;
    # constemb collapses all unit vectors to one point, so every
    # valid vector still gets its 5 tie-broken neighbors.
    assert rows[("zeroemb", "sim_ann_ivfpq_normalized")] == 0
    assert rows[("constemb", "sim_ann_ivfpq_normalized")] == n_vecs * 5
    # round-13 rows: the corpus-scaled-k dial shares the stack's
    # degenerate behavior (its count() anchor floors k at 8 on the
    # empty/zero corpora)...
    assert rows[("zeroemb", "sim_ann_ivfpq_scaled_k")] == 0
    assert rows[("constemb", "sim_ann_ivfpq_scaled_k")] == n_vecs * 5
    # ...and the NULL-component probe (the DuckDB list_sum-skips-NULL
    # divergence, r12 ADVICE): even vec_ids carry a NULL component →
    # dropped; odd vec_ids stay valid and each gets 5 neighbors.
    for op in ("sim_ann_ivfpq_normalized", "sim_ann_ivfpq_scaled_k"):
        assert rows[("nullcomp", op)] == (n_vecs // 2) * 5, op
