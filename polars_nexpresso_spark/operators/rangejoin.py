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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
    ``monotonically_increasing_id`` is used, which is only stable when
    the left plan's partitioning is (scan inputs yes, post-shuffle
    frames not guaranteed).

    Returns all left columns plus all non-key right columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left: {how!r}")
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive: {bucket_width}")
    taken = {"__b", "__lid"} & (set(left.columns) | set(right.columns))
    if taken:
        raise ValueError(
            f"columns {sorted(taken)} collide with interval_join "
            "internals; rename before joining"
        )
    w = F.lit(int(bucket_width))
    p = F.col(point).cast("long")
    s, e = F.col(start).cast("long"), F.col(end).cast("long")

    r2 = (
        right.filter(s.isNotNull() & e.isNotNull() & (e >= s))
        .withColumn("__b", F.explode(F.sequence(F.floor(s / w), F.floor(e / w))))
    )
    right_payload = [c for c in right.columns if c not in on]

    if how == "inner":
        joined = left.withColumn("__b", F.floor(p / w)).join(
            r2, on=[*on, "__b"], how="inner"
        ).filter((p >= s) & (p <= e))
        return joined.select(*left.columns, *right_payload)

    # how == 'left': recover unmatched left rows by row id — an anti-join
    # on the left's own columns would be wrong under duplicate left rows.
    if left_id is not None:
        lid = left.withColumn("__lid", F.col(left_id))
    else:
        lid = left.withColumn("__lid", F.monotonically_increasing_id())
    joined = lid.withColumn("__b", F.floor(p / w)).join(
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
