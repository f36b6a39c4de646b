"""Driver-side Catalyst plan statistics — no jobs, no RDD conversion."""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's static size estimate for a DataFrame's optimized plan.

    Driver-side plan stat — no job. py4j returns ``stats().sizeInBytes()``
    as a plain int when the scala BigInt fits a long, and as a JavaObject
    otherwise; normalize both. Raises on Spark Connect (no ``_jdf``) —
    callers treat that as "unknown" via their own try/except.
    """
    size = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    return size if isinstance(size, int) else int(size.toString())


def key_skew_stats(df: DataFrame, keys: list[str], *, top_n: int = 10):
    """Top-``top_n`` hottest key groups with their row share — the input
    to every salting decision (``pack(skew_salt=N)``, AQE skew-join
    tuning): a share far above ``1/n_groups`` means that key's shuffle
    partition runs long.

    Unlike the rest of this module this RUNS one job shape when
    executed: a partial-aggregated groupBy count, a broadcast total, and
    a TakeOrdered top-n (no full sort, no window). Deterministic
    tie-break on the key columns.
    """
    from pyspark.sql import functions as F

    counts = df.groupBy(*keys).agg(F.count("*").alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            *keys,
            "n_rows",
            F.round(F.col("n_rows") / F.col("__total"), 6).alias("share"),
        )
        .orderBy(
            F.col("n_rows").desc(), *[F.col(k).asc() for k in keys]
        )
        .limit(top_n)
    )
