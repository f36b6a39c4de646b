"""Physical-plan antipattern audit — the pre-deploy checklist, executable.

Every scale rule this repo's operators follow ("no cartesian products",
"no row-at-a-time Python", "filters reach the scan") is a string you can
grep out of the executed plan. ``audit_plan`` does exactly that, so a
pipeline can assert its own plan hygiene in CI the same way
``tests/test_plan_shapes.py`` pins this repo's operators — catching the
regression BEFORE it ships to a 1000-executor cluster, where a
cartesian product is an outage, not a slow test.

Driver-side string inspection only: no jobs run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# (warning id, plan substring, why it matters at scale)
_ANTIPATTERNS: list[tuple[str, str, str]] = [
    (
        "cartesian-product",
        "CartesianProduct",
        "all-pairs join: O(n*m) rows; block/bucket the join instead",
    ),
    (
        "nested-loop-join",
        "BroadcastNestedLoopJoin",
        "non-equi join fell back to nested loops; bucketize the range "
        "predicate or add an equi-key",
    ),
    (
        "python-row-udf",
        "BatchEvalPython",
        "row-at-a-time Python UDF: ~10-100x slower than Arrow; use "
        "pandas_udf or built-in expressions",
    ),
    (
        "global-sort",
        "rangepartitioning",
        "global sort: full-data range exchange; prefer per-group "
        "in-agg ordering or TakeOrdered for top-k",
    ),
]


def _has_unpartitioned_window(plan: str) -> bool:
    """A WindowExec with no partition spec forces an ``Exchange
    SinglePartition`` — the whole input sorts in ONE task.

    Bracket-group shapes (partition and order specs are BOTH optional):
    ``Window [funcs]`` = neither; ``Window [funcs], [k#1L]`` = partition
    only (the group carries no sort tokens); ``Window [funcs], [o ASC
    NULLS FIRST]`` = order only; ``Window [funcs], [k#1L], [o ASC...]``
    = both. So two groups are unpartitioned ONLY when the trailing
    group is an order spec — naive group-counting false-positives on
    every order-less partitioned window (round-5 advice).
    """
    for ln in plan.splitlines():
        stripped = ln.lstrip(" +-:*")
        if not stripped.startswith("Window "):
            continue
        groups = stripped.count("], [") + 1
        if groups >= 3:
            continue  # funcs + partition + order
        if groups == 1:
            return True  # funcs only: no partition spec at all
        last = stripped.rsplit("], [", 1)[-1]
        if " ASC" in last or " DESC" in last:
            return True  # [funcs], [order] — unpartitioned sort
    return False


def audit_plan(
    df: DataFrame, *, max_exchanges: int | None = None
) -> list[str]:
    """Return human-readable warnings for scale antipatterns in ``df``'s
    executed plan (empty list = clean). ``max_exchanges`` additionally
    flags plans that shuffle more than the given number of times.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    warnings: list[str] = []
    for wid, needle, why in _ANTIPATTERNS:
        if needle.lower() in plan.lower():
            warnings.append(f"{wid}: {why}")
    if _has_unpartitioned_window(plan):
        warnings.append(
            "window-without-partitionBy: single-partition sort of the "
            "whole input through one task; add a partition key, or keep "
            "such windows strictly on provably bounded (≤k-row) frames"
        )
    if max_exchanges is not None:
        n = plan.count("Exchange hashpartitioning")
        if n > max_exchanges:
            warnings.append(
                f"exchange-count: {n} hash exchanges > budget "
                f"{max_exchanges}; look for a reusable partitioning or a "
                "broadcastable side"
            )
    return warnings


def scale_report(df: DataFrame) -> dict:
    """One-call pre-deploy summary of a plan's scale posture — what a
    reviewer greps an ``explain`` for, as a dict a CI check can assert
    on. Driver-side only: no jobs run.

    Keys: ``warnings`` (the :func:`audit_plan` findings), ``exchanges``
    (hash-partitioned shuffle count), ``broadcasts`` (broadcast-exchange
    count), ``estimated_input_bytes`` (Catalyst's static estimate — an
    upper-bound-ish planning number, None on Connect), ``codegen_spans``
    (WholeStageCodegen regions: more/wider spans = more of the plan runs
    fused JVM code — under AQE this reads 0 until the plan has actually
    executed, since the adaptive plan finalizes at runtime), and
    ``python_stages`` (Arrow/pandas evaluation operators — expected for
    mapInPandas operators, a smell elsewhere).
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    est: int | None
    try:
        from polars_nexpresso_spark.plans.stats import plan_size_bytes

        est = plan_size_bytes(df)
    except Exception:  # noqa: BLE001 — Connect / stats unavailable
        est = None
    return {
        "warnings": audit_plan(df),
        "exchanges": plan.count("Exchange hashpartitioning"),
        "broadcasts": plan.count("BroadcastExchange"),
        "estimated_input_bytes": est,
        "codegen_spans": plan.count("WholeStageCodegen"),
        "python_stages": sum(
            plan.count(t)
            for t in ("ArrowEvalPython", "BatchEvalPython",
                      "MapInPandas", "FlatMapGroupsInPandas")
        ),
    }
