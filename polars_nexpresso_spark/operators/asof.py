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
candidate expansion like the naive ``t_r <= t_l`` range join.

Skewed keys concentrate in single window partitions (Spark windows
don't salt). ``skew_time_bucket`` activates the sharded path — the
standard time-series sharding, implemented, not just documented:

- **Phase A** quantizes the time axis into coarse buckets (exact long
  arithmetic, same hazard class as the range join's buckets) and runs
  the carry window partitioned by ``(key, bucket)`` — a hot key is now
  spread over as many partitions as it has time buckets.
- **Phase B** resolves left rows whose bucket held no qualifying right
  row: the nearest right row then lives in the closest *earlier*
  (backward) bucket. Per ``(key, bucket)`` the latest right payload is
  a one-row summary; a second carry window runs over the DISTINCT
  bucket set per key — cardinality bounded by time-range/width, not by
  row count — and the result equi-joins back on ``(key, bucket)``,
  which distributes the hot key again.

Decide with ``plans.stats.key_skew_stats``: if the top key's share of
rows exceeds what one executor core should sort, set
``skew_time_bucket`` so that share divides into O(cores) buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RESERVED = {"__t", "__ax", "__bk", "__is_left", "__payload", "__c", "__sp"}


def _floor_bucket_expr(colname: str, width: int) -> Column:
    """floor(col / width) in exact 64-bit arithmetic (``/`` promotes to
    double and mis-buckets at epoch-ns magnitude; DIV truncates toward
    zero, hence the negative-remainder correction)."""
    c = f"`{colname}`"
    return F.expr(
        f"CASE WHEN {c} % {width}L < 0 THEN {c} DIV {width}L - 1 "
        f"ELSE {c} DIV {width}L END"
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    direction: str = "backward",
    skew_time_bucket: int | None = None,
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

    ``skew_time_bucket`` (optional, in units of the time column cast to
    long — seconds for timestamps) switches to the two-phase sharded
    plan described in the module docstring: same results, but no window
    partition ever holds more than one key-bucket of rows. Use when
    ``key_skew_stats`` shows a dominant key; leave ``None`` for
    well-distributed keys (one window, one shuffle — strictly cheaper).

    Returns all ``left`` columns plus ``payload_cols``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")
    if skew_time_bucket is not None and skew_time_bucket <= 0:
        raise ValueError(
            f"skew_time_bucket must be positive: {skew_time_bucket}"
        )
    overlap = set(payload_cols) & set(left.columns)
    if overlap:
        raise ValueError(
            f"payload columns {sorted(overlap)} collide with left columns; "
            "rename before joining"
        )
    taken = _RESERVED & (set(left.columns) | set(right.columns))
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

    backward = direction == "backward"
    t_order = F.col("__t").asc() if backward else F.col("__t").desc()
    # A NULL left time matches nothing in either direction (it has no
    # position on the axis) — without the guard, desc ordering would sort
    # NULLs last and hand them the full carry.
    payload = [
        F.when(F.col("__t").isNotNull(), F.col(f"__c.{c}")).alias(c)
        for c in payload_cols
    ]

    if skew_time_bucket is None:
        u = l2.unionByName(r2, allowMissingColumns=True)
        w = (
            Window.partitionBy(*on)
            .orderBy(t_order, F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            u.withColumn("__c", F.last("__payload", ignorenulls=True).over(w))
            .filter(F.col("__is_left") == 1)
            .select(*left.columns, *payload)
        )

    # ---- sharded path ----
    width = int(skew_time_bucket)

    def bucketize(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("__ax", F.col("__t").cast("long"))
            .withColumn("__bk", _floor_bucket_expr("__ax", width))
            .drop("__ax")
        )

    l2b, r2b = bucketize(l2), bucketize(r2)

    # Phase A: carry within (key, bucket) — hot keys spread across buckets.
    u = l2b.unionByName(r2b, allowMissingColumns=True)
    w_a = (
        Window.partitionBy(*on, "__bk")
        .orderBy(t_order, F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    phase_a = u.withColumn(
        "__c", F.last("__payload", ignorenulls=True).over(w_a)
    ).filter(F.col("__is_left") == 1)

    matched = phase_a.filter(F.col("__c").isNotNull())
    rest = phase_a.filter(F.col("__c").isNull())

    # Phase B: per (key, bucket), the best right payload is the latest
    # (backward) / earliest (forward) in that bucket — buckets are
    # monotone in time, so the nearest cross-bucket match for an
    # unmatched left row is the summary of the closest earlier/later
    # bucket. Resolve over DISTINCT buckets only (bounded cardinality),
    # then equi-join back on (key, bucket).
    best = F.max_by("__payload", "__t") if backward else F.min_by(
        "__payload", "__t"
    )
    summary = r2b.groupBy(*on, "__bk").agg(best.alias("__sp"))
    bk_order = F.col("__bk").asc() if backward else F.col("__bk").desc()
    need = (
        rest.filter(F.col("__t").isNotNull())
        .select(*on, "__bk")
        .distinct()
        .withColumn("__is_left", F.lit(1))
        .withColumn("__sp", F.lit(None).cast(summary.schema["__sp"].dataType))
    )
    # Left rows sort BEFORE the same bucket's summary (__is_left desc) so
    # a left bucket never sees its own bucket's rows — phase A already
    # ruled those out as at-or-before candidates.
    w_b = (
        Window.partitionBy(*on)
        .orderBy(bk_order, F.col("__is_left").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lookup = (
        need.unionByName(summary.withColumn("__is_left", F.lit(0)))
        .withColumn("__c", F.last("__sp", ignorenulls=True).over(w_b))
        .filter(F.col("__is_left") == 1)
        .select(*on, "__bk", "__c")
    )
    rest2 = rest.drop("__c").join(lookup, on=[*on, "__bk"], how="left")
    out = matched.unionByName(rest2, allowMissingColumns=False)
    return out.select(*left.columns, *payload)
