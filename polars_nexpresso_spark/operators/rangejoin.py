"""Point-in-interval (range) join without a theta/cross join.

Joining points to containing intervals is a range predicate, which
Spark's planner executes as BroadcastNestedLoop / cartesian when written
directly — quadratic and cluster-hostile. The scalable form is the
standard BUCKETED range join: quantize the axis into fixed-width
buckets, list each interval under every bucket it covers (``<= 1 +
len/width`` replicas), put each point in its single bucket, equi-join on
``(keys..., bucket)``, and verify the exact predicate after. The shuffle
carries |left| + |right| · avg_span/width rows on hash-partitioned keys,
Catalyst plans an ordinary hash join (AQE can still broadcast a small
side), and the range predicate runs only on bucket-colocated candidates.

A point lies in exactly one bucket and an interval is listed once per
covered bucket, so each qualifying (point, interval) pair meets exactly
once — no post-join dedup is needed.

Bucket assignment is EXACT LONG ARITHMETIC, not ``floor(x / w)``: long /
long promotes to double in Spark, and at epoch-nanosecond magnitudes
(~1.7e18, double ulp ≈ 256) a boundary value can round into the wrong
bucket — the exact predicate then never sees the candidate and a
matching pair is silently dropped. ``DIV`` truncates toward zero, so the
floor correction subtracts one when the remainder is negative.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _floor_bucket(colname: str, width: int) -> Column:
    """floor(col / width) in exact 64-bit integer arithmetic.

    ``DIV`` truncates toward zero; for a negative axis value with a
    nonzero remainder that is one bucket too high, so correct it. Double
    division is NOT exact above 2^53 — epoch-ns axes mis-bucket.
    """
    c = f"`{colname}`"
    return F.expr(
        f"CASE WHEN {c} % {width}L < 0 THEN {c} DIV {width}L - 1 "
        f"ELSE {c} DIV {width}L END"
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    point: str,
    start: str,
    end: str,
    bucket_width: int,
    how: str = "inner",
    left_id: str | None = None,
) -> DataFrame:
    """Join each left row (at ``point``) to every right interval
    ``[start, end]`` (inclusive both ends) containing it, matching on
    ``on`` keys. ``point``/``start``/``end`` must be numeric or castable
    to long (for timestamps pass e.g. ``unix_micros`` projections).

    ``bucket_width`` sets the quantization: replicas per interval are
    ``1 + ceil(len/width)`` worst-case, so pick it near the TYPICAL
    interval length — too small multiplies the right side, too large
    widens the candidate set the exact predicate must discard.

    ``how='inner'`` keeps matched pairs; ``'left'`` also keeps left rows
    with no containing interval, with NULL right payload. For ``'left'``
    pass ``left_id`` naming a unique left column — unmatched rows are
    recovered by anti-joining on it. Without one, a synthetic
    ``monotonically_increasing_id`` is assigned and the frame is
    eagerly ``localCheckpoint``-ed so both plan branches (match join and
    anti-join) observe identical ids even when the left plan is
    post-shuffle; prefer ``left_id`` at scale to skip that
    materialization.

    Returns all left columns plus all non-key right columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left: {how!r}")
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive: {bucket_width}")
    taken = {"__b", "__lid", "__p", "__s", "__e"} & (
        set(left.columns) | set(right.columns)
    )
    if taken:
        raise ValueError(
            f"columns {sorted(taken)} collide with interval_join "
            "internals; rename before joining"
        )
    right_payload = [c for c in right.columns if c not in on]
    overlap = set(right_payload) & set(left.columns)
    if overlap:
        raise ValueError(
            f"right columns {sorted(overlap)} collide with left columns; "
            "rename before joining"
        )
    w = int(bucket_width)
    p = F.col(point).cast("long")
    s, e = F.col(start).cast("long"), F.col(end).cast("long")

    r2 = (
        right.filter(s.isNotNull() & e.isNotNull() & (e >= s))
        .withColumn("__s", s)
        .withColumn("__e", e)
        .withColumn(
            "__b",
            F.explode(F.sequence(_floor_bucket("__s", w), _floor_bucket("__e", w))),
        )
        .drop("__s", "__e")
    )

    def _with_point_bucket(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("__p", p)
            .withColumn("__b", _floor_bucket("__p", w))
            .drop("__p")
        )

    if how == "inner":
        joined = _with_point_bucket(left).join(
            r2, on=[*on, "__b"], how="inner"
        ).filter((p >= s) & (p <= e))
        return joined.select(*left.columns, *right_payload)

    # how == 'left': recover unmatched left rows by row id — an anti-join
    # on the left's own columns would be wrong under duplicate left rows.
    if left_id is not None:
        lid = left.withColumn("__lid", F.col(left_id))
    else:
        # monotonically_increasing_id is only stable per evaluation;
        # pin one assignment so the match and anti branches agree.
        lid = left.withColumn(
            "__lid", F.monotonically_increasing_id()
        ).localCheckpoint()
    joined = _with_point_bucket(lid).join(
        r2, on=[*on, "__b"], how="inner"
    ).filter((p >= s) & (p <= e))
    unmatched = lid.join(
        joined.select("__lid").distinct(), on="__lid", how="left_anti"
    ).select(
        *left.columns,
        *[F.lit(None).cast(right.schema[c].dataType).alias(c)
          for c in right_payload],
    )
    return joined.select(*left.columns, *right_payload).unionByName(unmatched)
