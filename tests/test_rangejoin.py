"""Unit tests for the bucketed point-in-interval join."""

from __future__ import annotations

import pytest

from polars_nexpresso_spark.operators.rangejoin import interval_join


@pytest.fixture()
def frames(spark):
    points = spark.createDataFrame(
        [
            (1, "k", 5),
            (2, "k", 10),  # boundary: == start of B, == end of A
            (3, "k", 27),  # interval spanning multiple buckets
            (4, "k", 99),  # no interval
            (5, "z", 5),  # key with no intervals
        ],
        ["pid", "key", "t"],
    )
    intervals = spark.createDataFrame(
        [
            ("k", "A", 0, 10),
            ("k", "B", 10, 12),  # overlaps A at t=10
            ("k", "C", 20, 45),  # spans buckets [2..4] at width 10
        ],
        ["key", "iv", "s", "e"],
    )
    return points, intervals


def test_inner_semantics_inclusive_bounds(frames):
    points, intervals = frames
    got = {
        (r["pid"], r["iv"])
        for r in interval_join(
            points,
            intervals,
            on=["key"],
            point="t",
            start="s",
            end="e",
            bucket_width=10,
        ).collect()
    }
    assert got == {(1, "A"), (2, "A"), (2, "B"), (3, "C")}


def test_left_keeps_unmatched(frames):
    points, intervals = frames
    rows = interval_join(
        points,
        intervals,
        on=["key"],
        point="t",
        start="s",
        end="e",
        bucket_width=10,
        how="left",
        left_id="pid",
    ).collect()
    by_pid: dict[int, list] = {}
    for r in rows:
        by_pid.setdefault(r["pid"], []).append(r["iv"])
    assert sorted(by_pid[2]) == ["A", "B"]
    assert by_pid[4] == [None] and by_pid[5] == [None]
    assert len(rows) == 6  # 4 matched pairs + 2 unmatched lefts


def test_no_nested_loop_join(frames):
    points, intervals = frames
    plan = (
        interval_join(
            points,
            intervals,
            on=["key"],
            point="t",
            start="s",
            end="e",
            bucket_width=10,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_degenerate_and_invalid_intervals(spark):
    points = spark.createDataFrame([(1, "k", 7)], ["pid", "key", "t"])
    intervals = spark.createDataFrame(
        [("k", "P", 7, 7), ("k", "N", 9, 3), ("k", "U", None, 9)],
        "key string, iv string, s long, e long",
    )
    got = [
        r["iv"]
        for r in interval_join(
            points,
            intervals,
            on=["key"],
            point="t",
            start="s",
            end="e",
            bucket_width=5,
        ).collect()
    ]
    assert got == ["P"]  # zero-length interval matches; inverted/null drop


def test_invalid_args(frames):
    points, intervals = frames
    with pytest.raises(ValueError, match="bucket_width"):
        interval_join(
            points, intervals, on=["key"], point="t", start="s", end="e",
            bucket_width=0,
        )
    with pytest.raises(ValueError, match="how"):
        interval_join(
            points, intervals, on=["key"], point="t", start="s", end="e",
            bucket_width=5, how="outer",
        )


def test_reserved_column_guard(spark):
    points = spark.createDataFrame([(1, "k", 5, 9)], ["pid", "key", "t", "__b"])
    intervals = spark.createDataFrame([("k", "A", 0, 10)], ["key", "iv", "s", "e"])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="internals"):
        interval_join(
            points, intervals, on=["key"], point="t", start="s", end="e",
            bucket_width=5,
        )


def test_bucket_math_exact_at_epoch_ns(spark):
    """Bucket assignment must be exact long arithmetic, not double.

    1_700_000_000_000_016_000 is an epoch-ns value whose nearest double
    is 1_700_000_000_000_015_872 (ulp 256 at this magnitude), so
    ``floor(x / 1000)`` computed via double division yields
    1_700_000_000_000_015 — one bucket low. The exact ``DIV`` path must
    give 1_700_000_000_000_016. This test fails if ``_floor_bucket``
    reverts to ``F.floor(col / lit)``.
    """
    from pyspark.sql import functions as F

    from polars_nexpresso_spark.operators.rangejoin import _floor_bucket

    x = 1_700_000_000_000_016_000
    df = spark.createDataFrame([(x,), (-7,), (-9,), (9,)], "v long")
    rows = {
        r["v"]: (r["exact"], r["dbl"])
        for r in df.select(
            "v",
            _floor_bucket("v", 1000).alias("exact"),
            F.floor(F.col("v") / F.lit(1000)).alias("dbl"),
        ).collect()
    }
    assert rows[x][0] == x // 1000
    assert rows[x][1] == x // 1000 - 1  # the double path really is wrong
    # negative axis: DIV truncates toward zero; floor correction applies
    assert rows[-7][0] == -7 // 1000 == -1
    assert rows[-9][0] == -1 and rows[9][0] == 0


def test_interval_join_exact_at_epoch_ns_magnitude(spark):
    """End-to-end at epoch-ns magnitude: boundary points land in their
    true bucket and every containing interval is found."""
    x = 1_700_000_000_000_016_000
    points = spark.createDataFrame(
        [(1, "k", x), (2, "k", x - 1), (3, "k", x + 999)],
        "pid long, key string, t long",
    )
    intervals = spark.createDataFrame(
        [("k", "A", x, x + 500), ("k", "B", x - 2000, x - 1)],
        "key string, iv string, s long, e long",
    )
    got = {
        (r["pid"], r["iv"])
        for r in interval_join(
            points, intervals, on=["key"], point="t", start="s", end="e",
            bucket_width=1000,
        ).collect()
    }
    assert got == {(1, "A"), (2, "B")}


def test_right_left_column_collision_guard(spark):
    points = spark.createDataFrame([(1, "k", 5)], ["pid", "key", "t"])
    intervals = spark.createDataFrame(
        [("k", 9, 0, 10)], ["key", "pid", "s", "e"]  # pid collides
    )
    with pytest.raises(ValueError, match="collide with left"):
        interval_join(
            points, intervals, on=["key"], point="t", start="s", end="e",
            bucket_width=5,
        )


def test_left_without_left_id_stable_under_shuffle(spark):
    """how='left' with no left_id must not lose/duplicate rows even when
    the left frame is post-shuffle (ids pinned via localCheckpoint)."""
    from pyspark.sql import functions as F

    base = spark.range(0, 200).select(
        F.lit("k").alias("key"), (F.col("id") % 37).alias("t")
    )
    # aggregation output = post-shuffle frame with duplicate payload rows
    left = base.groupBy("key", "t").agg(F.count("*").alias("n")).repartition(8)
    intervals = spark.createDataFrame(
        [("k", "A", 0, 9)], ["key", "iv", "s", "e"]
    )
    out = interval_join(
        left, intervals, on=["key"], point="t", start="s", end="e",
        bucket_width=5, how="left",
    )
    n_left = left.count()
    assert out.count() == n_left  # each left row exactly once (<=1 match each)
    matched = out.filter(F.col("iv").isNotNull()).count()
    assert matched == left.filter(F.col("t") <= 9).count()


def test_interval_join_matches_bruteforce_randomized(spark):
    import random

    rng = random.Random(7)
    keys = ["a", "b", "c"]
    points = [(i, rng.choice(keys), rng.randint(0, 50)) for i in range(40)]
    intervals = []
    for i in range(15):
        s = rng.randint(0, 45)
        intervals.append(
            (rng.choice(keys), f"iv{i}", s, s + rng.randint(0, 20))
        )
    pdf = spark.createDataFrame(points, ["pid", "key", "t"])
    idf = spark.createDataFrame(intervals, ["key", "iv", "s", "e"])
    for width in (1, 7, 64):  # tiny, mid, larger-than-any-interval buckets
        got = {
            (r["pid"], r["iv"])
            for r in interval_join(
                pdf, idf, on=["key"], point="t", start="s", end="e",
                bucket_width=width,
            ).collect()
        }
        want = {
            (pid, iv)
            for (pid, pk, t) in points
            for (ik, iv, s, e) in intervals
            if pk == ik and s <= t <= e
        }
        assert got == want, width


def test_floor_bucket_exact_on_random_extremes(spark):
    """_floor_bucket == Python floor-division over the full long range,
    including magnitudes where double division is wrong."""
    import random

    from polars_nexpresso_spark.operators.rangejoin import _floor_bucket

    rng = random.Random(97)
    widths = [1, 3, 1000, 86_400_000_000]
    vals = [0, 1, -1, 2**62, -(2**62), 2**63 - 1, -(2**63)]
    vals += [rng.randint(-(2**63), 2**63 - 1) for _ in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    for w in widths:
        got = {
            r["v"]: r["b"]
            for r in df.select("v", _floor_bucket("v", w).alias("b")).collect()
        }
        for v in vals:
            assert got[v] == v // w, (v, w)
