"""Unit tests for the as-of (point-in-time) join operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_nexpresso_spark.operators.asof import asof_join


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", 10),
            (2, "u1", 25),
            (3, "u1", 5),  # before any right row
            (4, "u2", 100),
            (5, "u3", 50),  # key with no right rows at all
            (6, "u1", 20),  # exactly ON a right timestamp
        ],
        ["event_id", "key", "t"],
    )
    right = spark.createDataFrame(
        [
            ("u1", 8, 1.0),
            ("u1", 20, 2.0),
            ("u1", 30, 3.0),
            ("u2", 100, 9.0),  # tie: at-or-before includes equal
        ],
        ["key", "rt", "rate"],
    )
    return left, right


def test_backward_semantics(frames):
    left, right = frames
    out = {
        r["event_id"]: r["rate"]
        for r in asof_join(
            left,
            right,
            on=["key"],
            left_time="t",
            right_time="rt",
            payload_cols=["rate"],
        ).collect()
    }
    assert out == {1: 1.0, 2: 2.0, 3: None, 4: 9.0, 5: None, 6: 2.0}


def test_forward_semantics(frames):
    left, right = frames
    out = {
        r["event_id"]: r["rate"]
        for r in asof_join(
            left,
            right,
            on=["key"],
            left_time="t",
            right_time="rt",
            payload_cols=["rate"],
            direction="forward",
        ).collect()
    }
    # forward: smallest right time >= left time
    assert out == {1: 2.0, 2: 3.0, 3: 1.0, 4: 9.0, 5: None, 6: 2.0}


def test_null_left_time_matches_nothing(spark):
    left = spark.createDataFrame(
        [(1, "k", None), (2, "k", 10)], "event_id long, key string, t long"
    )
    right = spark.createDataFrame([("k", 5, 7.0)], ["key", "rt", "rate"])
    for direction in ("backward", "forward"):
        out = {
            r["event_id"]: r["rate"]
            for r in asof_join(
                left,
                right,
                on=["key"],
                left_time="t",
                right_time="rt",
                payload_cols=["rate"],
                direction=direction,
            ).collect()
        }
        assert out[1] is None, direction


def test_null_right_rows_dropped(spark):
    left = spark.createDataFrame([(1, "k", 10)], ["event_id", "key", "t"])
    right = spark.createDataFrame(
        [("k", None, 99.0), (None, 5, 88.0), ("k", 5, 1.5)],
        "key string, rt long, rate double",
    )
    row = asof_join(
        left,
        right,
        on=["key"],
        left_time="t",
        right_time="rt",
        payload_cols=["rate"],
    ).collect()[0]
    assert row["rate"] == 1.5


def test_multi_payload_and_collision_guard(frames):
    left, right = frames
    out = asof_join(
        left,
        right,
        on=["key"],
        left_time="t",
        right_time="rt",
        payload_cols=["rate", "rt"],
    )
    row = {r["event_id"]: r for r in out.collect()}
    assert row[2]["rt"] == 20 and row[2]["rate"] == 2.0
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            left.withColumnRenamed("t", "rate"),
            right,
            on=["key"],
            left_time="rate",
            right_time="rt",
            payload_cols=["rate"],
        )


def test_single_shuffle_plan(frames):
    left, right = frames
    plan = (
        asof_join(
            left,
            right,
            on=["key"],
            left_time="t",
            right_time="rt",
            payload_cols=["rate"],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one hashpartitioning exchange on the key for the window; the union
    # sides must NOT each pay their own key shuffle after it
    assert plan.count("Exchange hashpartitioning") == 1


def test_reserved_column_guard(spark):
    left = spark.createDataFrame([(1, "k", 5, 0)], ["e", "key", "t", "__t"])
    right = spark.createDataFrame([("k", 1, 2.0)], ["key", "rt", "rate"])
    with pytest.raises(ValueError, match="internals"):
        asof_join(
            left, right, on=["key"], left_time="t", right_time="rt",
            payload_cols=["rate"],
        )


def test_asof_matches_bruteforce_randomized(spark):
    # Seeded random scenario cross-checked against a python brute force:
    # duplicate timestamps, sparse keys, both directions.
    import random

    rng = random.Random(11)
    keys = ["a", "b", "c", "d"]
    left_rows = [
        (i, rng.choice(keys), rng.randint(0, 30))
        for i in range(60)
    ]
    right_rows = [
        (rng.choice(keys), t, float(i))
        for i, t in enumerate(rng.sample(range(0, 30), 12))
    ]
    # make right unique per (key, t): keep max rate like the catalog query
    uniq = {}
    for k, t, v in right_rows:
        uniq[(k, t)] = max(uniq.get((k, t), float("-inf")), v)
    right_rows = [(k, t, v) for (k, t), v in uniq.items()]

    left = spark.createDataFrame(left_rows, ["eid", "key", "t"])
    right = spark.createDataFrame(right_rows, ["key", "rt", "rate"])

    for direction in ("backward", "forward"):
        got = {
            r["eid"]: r["rate"]
            for r in asof_join(
                left, right, on=["key"], left_time="t", right_time="rt",
                payload_cols=["rate"], direction=direction,
            ).collect()
        }
        for eid, k, t in left_rows:
            if direction == "backward":
                cands = [(rt, v) for (kk, rt, v) in right_rows
                         if kk == k and rt <= t]
                want = max(cands)[1] if cands else None
            else:
                cands = [(rt, v) for (kk, rt, v) in right_rows
                         if kk == k and rt >= t]
                want = min(cands)[1] if cands else None
            assert got[eid] == want, (direction, eid, k, t)


def test_sharded_matches_base_on_fixture(frames):
    left, right = frames
    base = {
        (r["event_id"], r["rate"])
        for r in asof_join(
            left, right, on=["key"], left_time="t", right_time="rt",
            payload_cols=["rate"],
        ).collect()
    }
    for width in (1, 7, 1000):  # 1000 >> range: everything in one bucket
        sharded = {
            (r["event_id"], r["rate"])
            for r in asof_join(
                left, right, on=["key"], left_time="t", right_time="rt",
                payload_cols=["rate"], skew_time_bucket=width,
            ).collect()
        }
        assert sharded == base, width


def test_sharded_matches_bruteforce_hot_key(spark):
    # One key holds 50% of all rows (the skew scenario the sharding
    # exists for); cross-bucket gaps force the phase-B carry.
    import random

    rng = random.Random(23)
    keys = ["hot"] * 4 + ["a", "b", "c", "d"]
    left_rows = [
        (i, rng.choice(keys), rng.randint(0, 500)) for i in range(120)
    ]
    uniq = {}
    for _ in range(25):
        k, t = rng.choice(keys), rng.randint(0, 80)  # rights early only:
        uniq[(k, t)] = float(len(uniq))  # late lefts need far-back carry
    right_rows = [(k, t, v) for (k, t), v in uniq.items()]
    left = spark.createDataFrame(left_rows, ["eid", "key", "t"])
    right = spark.createDataFrame(right_rows, ["key", "rt", "rate"])

    for direction in ("backward", "forward"):
        got = {
            r["eid"]: r["rate"]
            for r in asof_join(
                left, right, on=["key"], left_time="t", right_time="rt",
                payload_cols=["rate"], direction=direction,
                skew_time_bucket=16,
            ).collect()
        }
        for eid, k, t in left_rows:
            if direction == "backward":
                cands = [(rt, v) for (kk, rt, v) in right_rows
                         if kk == k and rt <= t]
                want = max(cands)[1] if cands else None
            else:
                cands = [(rt, v) for (kk, rt, v) in right_rows
                         if kk == k and rt >= t]
                want = min(cands)[1] if cands else None
            assert got[eid] == want, (direction, eid, k, t)


def test_sharded_no_key_only_window_over_full_union(frames):
    # The full |left|+|right| union must only ever be windowed by
    # (key, bucket); a key-only window may appear solely over the
    # bounded distinct-bucket frame (phase B). Assert every window that
    # carries __payload partitions by __bk too.
    left, right = frames
    plan = (
        asof_join(
            left, right, on=["key"], left_time="t", right_time="rt",
            payload_cols=["rate"], skew_time_bucket=10,
        )
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    import re

    payload_windows = [
        ln for ln in plan.splitlines()
        if "windowspecdefinition" in ln and "__payload" in ln
    ]
    assert payload_windows, plan
    for ln in payload_windows:
        assert re.search(r"windowspecdefinition\([^)]*__bk", ln), ln


def test_sharded_invalid_width(frames):
    left, right = frames
    with pytest.raises(ValueError, match="skew_time_bucket"):
        asof_join(
            left, right, on=["key"], left_time="t", right_time="rt",
            payload_cols=["rate"], skew_time_bucket=0,
        )


def test_sharded_null_left_time_matches_nothing(spark):
    left = spark.createDataFrame(
        [(1, "k", None), (2, "k", 30)], "eid long, key string, t long"
    )
    right = spark.createDataFrame(
        [("k", 10, 1.5)], ["key", "rt", "rate"]
    )
    for direction in ("backward", "forward"):
        out = {
            r["eid"]: r["rate"]
            for r in asof_join(
                left, right, on=["key"], left_time="t", right_time="rt",
                payload_cols=["rate"], direction=direction,
                skew_time_bucket=8,
            ).collect()
        }
        assert out[1] is None
        assert out[2] == (1.5 if direction == "backward" else None)
