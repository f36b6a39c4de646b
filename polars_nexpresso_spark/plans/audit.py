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
    """A WindowExec with no partition spec prints as ``Window [funcs],
    [order]`` (two bracket groups; partitioned adds a third) and forces
    an ``Exchange SinglePartition`` — the whole input sorts in ONE task.
    """
    for ln in plan.splitlines():
        stripped = ln.lstrip(" +-:*")
        if stripped.startswith("Window ") and stripped.count("], [") < 2:
            return True
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
