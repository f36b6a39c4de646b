"""Unit tests for the deletion-neighborhood fuzzy join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_nexpresso_spark.operators.fuzzyjoin import (
    deletion_variants,
    fuzzy_join,
)


def _ed(a: str, b: str) -> int:
    # plain Wagner-Fischer
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


def test_deletion_variants_k1(spark):
    rows = spark.createDataFrame([("abc",)], ["s"]).select(
        deletion_variants(F.col("s"), 1).alias("v")
    ).collect()
    assert sorted(rows[0]["v"]) == ["ab", "abc", "ac", "bc"]


def test_fuzzy_join_matches_bruteforce(spark):
    import random

    rng = random.Random(31)
    alphabet = "abcd"
    words = list({
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
        for _ in range(60)
    })
    left = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], ["lid", "lw"]
    )
    right = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], ["rid", "rw"]
    )
    for k in (1, 2):
        got = {
            (r["lid"], r["rid"], r["distance"])
            for r in fuzzy_join(
                left, right, left_on="lw", right_on="rw", max_distance=k
            ).collect()
        }
        want = {
            (i, j, _ed(a, b))
            for i, a in enumerate(words)
            for j, b in enumerate(words)
            if _ed(a, b) <= k
        }
        assert got == want, k


def test_fuzzy_join_null_and_exact_keys(spark):
    left = spark.createDataFrame(
        [(1, "g1", "abc"), (2, "g1", None), (3, "g2", "abc")],
        ["lid", "grp", "lw"],
    )
    right = spark.createDataFrame(
        [(10, "g1", "abd"), (11, "g2", "zzz")], ["rid", "grp", "rw"]
    )
    got = {
        (r["lid"], r["rid"])
        for r in fuzzy_join(
            left, right, left_on="lw", right_on="rw",
            max_distance=1, on=["grp"],
        ).collect()
    }
    # only lid=1 matches: same group g1, ed("abc","abd")=1; NULL matches
    # nothing; lid=3 is in g2 where the only right name is 3 edits away
    assert got == {(1, 10)}


def test_fuzzy_join_validates(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "w"])
    with pytest.raises(ValueError, match="max_distance"):
        fuzzy_join(df, df.withColumnRenamed("id", "id2")
                   .withColumnRenamed("w", "w2"),
                   left_on="w", right_on="w2", max_distance=3)
    with pytest.raises(ValueError, match="collide"):
        fuzzy_join(df, df, left_on="w", right_on="w", max_distance=1)


def test_fuzzy_join_no_cartesian_plan(spark):
    left = spark.createDataFrame([(1, "abc")], ["lid", "lw"])
    right = spark.createDataFrame([(2, "abd")], ["rid", "rw"])
    plan = (
        fuzzy_join(left, right, left_on="lw", right_on="rw", max_distance=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_fuzzy_join_preserves_duplicate_row_multiplicity(spark):
    # Two fully identical left rows must each produce their own output
    # pair — quadratic-join semantics, not collapsed (round-5 advice).
    left = spark.createDataFrame(
        [(1, "abc"), (1, "abc"), (2, "xbc")], ["lid", "lw"]
    )
    right = spark.createDataFrame([(9, "abd")], ["rid", "rw"])
    got = sorted(
        (r["lid"], r["rid"], r["distance"])
        for r in fuzzy_join(
            left, right, left_on="lw", right_on="rw", max_distance=1
        ).collect()
    )
    # lid=1 twice (duplicate rows), lid=2 not within 1 edit of "abd"
    assert got == [(1, 9, 1), (1, 9, 1)]


def test_fuzzy_join_dedup_exchange_is_narrow(spark):
    # The candidate-dedup aggregate must key and carry ONLY the narrow
    # string pair (+ the verified distance) — payload columns re-attach
    # after the dedup, so no exchange below it may output lid/rid.
    left = spark.createDataFrame([(1, "abc", "L" * 50)], ["lid", "lw", "lpay"])
    right = spark.createDataFrame([(2, "abd", "R" * 50)], ["rid", "rw", "rpay"])
    out = fuzzy_join(left, right, left_on="lw", right_on="rw", max_distance=1)
    out.write.format("noop").mode("overwrite").save()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # The dedup is the HashAggregate keyed on [lw, rw]; its input
    # SUBTREE (lines below it with deeper tree markers, stopping at the
    # first sibling/ancestor) must not mention payload or id columns.
    def _depth(ln: str) -> int:
        for i, ch in enumerate(ln):
            if ch not in " :+-":
                return i
        return len(ln)

    lines = plan.splitlines()
    agg_idx = [
        i
        for i, ln in enumerate(lines)
        if "HashAggregate" in ln and "lw" in ln and "rw" in ln
    ]
    assert agg_idx, plan
    top = agg_idx[0]
    d0 = _depth(lines[top])
    subtree = []
    for ln in lines[top + 1 :]:
        if _depth(ln) <= d0:
            break
        # Leaf scans list the source's full schema; a Project prunes to
        # the narrow columns immediately above, so only the exchanges /
        # aggregates / joins between scan and dedup matter here.
        if "Scan " not in ln:
            subtree.append(ln)
    below = "\n".join(subtree)
    assert below, plan
    for col in ("lid", "rid", "lpay", "rpay"):
        assert col not in below, f"{col} leaked below the dedup:\n{plan}"


def test_fuzzy_join_variant_join_not_broadcast(spark):
    # The variant equi-join is corpus-scale on both sides at real data
    # sizes; the shuffle_hash hint must hold even when Catalyst's
    # pre-explode estimate would pick a (measured 3.5x slower) broadcast.
    left = spark.createDataFrame([(1, "abc")], ["lid", "lw"])
    right = spark.createDataFrame([(2, "abd")], ["rid", "rw"])
    out = fuzzy_join(left, right, left_on="lw", right_on="rw", max_distance=1)
    out.write.format("noop").mode("overwrite").save()
    plan = out._jdf.queryExecution().executedPlan().toString()
    variant_join = [
        ln for ln in plan.splitlines() if "Join" in ln and "__v" in ln
    ]
    assert variant_join, plan
    assert all("Broadcast" not in ln for ln in variant_join), plan
