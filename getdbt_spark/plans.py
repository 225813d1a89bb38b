"""Physical-plan introspection: the ".explain and iterate" discipline
as a library API.

``plan_report(df)`` reduces a DataFrame's formatted physical plan to
the handful of numbers that decide 100 TB viability (exchange count,
join strategies, nested-loop presence, pushdown reach, codegen spans);
``plan_lint(df)`` turns the report into named findings so a pipeline
can GATE on plan shape — the same checks ``tools/plan_audit.py``
publishes as PLANS.md and ``tests/test_plans.py`` pins in CI, callable
against any user-built frame before it ships.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import DataFrame

JOIN_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)

# Per-query nested-loop allow-list: {query_id: max BNLJ nodes}.  A
# BroadcastNestedLoopJoin whose build side is k-bounded BY CONSTRUCTION
# (not merely small at this SF) is the optimal fan-out plan; the only
# deliberate such shape is all-vectors × a k-row centroid codebook
# (codebooks are small by definition — the alternatives measure
# slower: literal explode re-evaluates k×dim literals per row,
# constant-key equi joins constant-fold back to cross joins):
# sim_ann_ivf scores one codebook; emb_kmeans_train scores one per
# Lloyd's round plus the final assignment, and the round-1 subtree
# appears twice in the lazy lineage (round-2 scoring AND the centroid
# rebuild join both consume it), so 2 rounds plan 4 nodes — all of
# them k-row build sides.  Everything else must be 0 — an unlisted
# NLJ is an accident that goes quadratic at 100 TB.
BOUNDED_NLJ_ALLOW: dict[str, int] = {
    "sim_ann_ivf": 1,
    "emb_kmeans_train": 4,
    "sim_ann_ivf_trained": 4,  # embeds the k-means rounds
}


def _formatted(df: DataFrame) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def plan_report(df: DataFrame) -> dict:
    """Summarize the physical plan: shuffle exchanges, join strategy
    counts, nested-loop/cartesian presence, scans with pushed filters
    vs total scans, and whole-stage-codegen span count."""
    plan = _formatted(df)
    nodes = Counter(re.findall(r"\(\d+\) ([A-Za-z]+)", plan))
    joins = {j: nodes.get(j, 0) for j in JOIN_NODES if nodes.get(j, 0)}
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    simple = df._jdf.queryExecution().executedPlan().toString()
    return {
        "exchanges": nodes.get("Exchange", 0),
        "joins": joins,
        "bnlj": nodes.get("BroadcastNestedLoopJoin", 0)
        + nodes.get("CartesianProduct", 0),
        "pushed": sum(1 for p in pushed if p.strip()),
        "scans": nodes.get("Scan", 0) + nodes.get("FileScan", 0),
        "codegen": len(set(re.findall(r"\*\((\d+)\)", simple))),
    }


def plan_lint(
    df: DataFrame,
    allow_nested_loop: bool = False,
    max_exchanges: int | None = None,
) -> list[str]:
    """Named findings over ``plan_report`` — empty list means the plan
    passes the engine's scale discipline.

    - ``nested-loop``: a BroadcastNestedLoopJoin / CartesianProduct is
      present (quadratic at scale) and not explicitly allowed (the
      bounded-fan-out spine/centroid patterns set
      ``allow_nested_loop=True`` deliberately).
    - ``exchange-budget``: more shuffle exchanges than the caller's
      stated budget.
    - ``scan-without-pushdown``: the plan filters rows but no filter
      reached any file scan — a full-scan-then-filter shape.
    """
    rep = plan_report(df)
    findings: list[str] = []
    if rep["bnlj"] and not allow_nested_loop:
        findings.append(
            f"nested-loop: {rep['bnlj']} nested-loop/cartesian join(s) — "
            "quadratic at scale; broadcast-hash or pre-bucket instead"
        )
    if max_exchanges is not None and rep["exchanges"] > max_exchanges:
        findings.append(
            f"exchange-budget: {rep['exchanges']} exchanges > budget "
            f"{max_exchanges}"
        )
    plan = _formatted(df)
    has_filter = bool(re.search(r"\(\d+\) Filter", plan))
    if rep["scans"] and has_filter and rep["pushed"] == 0:
        findings.append(
            "scan-without-pushdown: the plan filters rows but no "
            "predicate reached a file scan (PushedFilters all empty)"
        )
    return findings
