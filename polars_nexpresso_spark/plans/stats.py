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
