"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks.

Joins each left row to the single right row with the greatest (backward)
or smallest (forward) time at-or-equal its own, per key: the
last-touch-attribution / slowly-changing-dimension / market-data lookup
shape. DuckDB has this built in (``ASOF JOIN``), which gives the
implementation an exact SQL oracle.

Implementation is the UNION + carry-forward window form, not a per-key
loop and not an exploded inequality join:

1. tag left rows ``__is_left=1`` and right rows ``0``, union them on a
   shared time axis (right payload rides in one struct column; left
   rows carry NULL there);
2. one window per key ordered by ``(time, __is_left)`` carries
   ``last(payload, ignorenulls=True)`` forward — at equal times the
   right row sorts first, so "at-or-before" includes ties;
3. keep the left rows and unpack the carried struct.

Scale shape: ONE shuffle of |left| + |right| rows on the key (the same
partitioning a sort-merge join would need), no driver state, no Python.
The in-partition sort is (time, tag) — linear carry, no quadratic
candidate expansion like the naive ``t_r <= t_l`` range join. Skewed
keys concentrate in single window partitions (Spark windows don't
salt); at 100 TB, pre-bucket hot keys by coarse time range and run the
join per bucket with boundary replication — the standard time-series
sharding — or let AQE handle moderate skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Point-in-time join of ``left`` to ``right`` per ``on`` key.

    ``backward`` (default): each left row gets the payload of the right
    row with the greatest ``right_time`` <= its ``left_time``;
    ``forward``: smallest ``right_time`` >= ``left_time``. Left rows
    with no qualifying right row keep NULL payload (left-join
    semantics, matching DuckDB's ``ASOF LEFT JOIN``).

    ``right`` should be unique per ``(on..., right_time)`` — with
    duplicates, which row wins is tie-broken arbitrarily (aggregate
    first to make it deterministic). Right rows with NULL key or time
    are dropped (they can match nothing).

    Returns all ``left`` columns plus ``payload_cols``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")
    overlap = set(payload_cols) & set(left.columns)
    if overlap:
        raise ValueError(
            f"payload columns {sorted(overlap)} collide with left columns; "
            "rename before joining"
        )
    reserved = {"__t", "__is_left", "__payload", "__c"}
    taken = reserved & (set(left.columns) | set(right.columns))
    if taken:
        raise ValueError(
            f"columns {sorted(taken)} collide with asof_join internals; "
            "rename before joining"
        )

    r = right
    for c in [*on, right_time]:
        r = r.filter(F.col(c).isNotNull())
    r2 = r.select(
        *on,
        F.col(right_time).alias("__t"),
        F.struct(*payload_cols).alias("__payload"),
        F.lit(0).alias("__is_left"),
    )
    l2 = left.withColumn("__t", F.col(left_time)).withColumn(
        "__is_left", F.lit(1)
    )
    u = l2.unionByName(r2, allowMissingColumns=True)

    t_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy(*on)
        .orderBy(t_order, F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("__payload", ignorenulls=True).over(w)
    # A NULL left time matches nothing in either direction (it has no
    # position on the axis) — without the guard, desc ordering would sort
    # NULLs last and hand them the full carry.
    payload = [
        F.when(F.col("__t").isNotNull(), F.col(f"__c.{c}")).alias(c)
        for c in payload_cols
    ]
    return (
        u.withColumn("__c", carried)
        .filter(F.col("__is_left") == 1)
        .select(*left.columns, *payload)
    )
