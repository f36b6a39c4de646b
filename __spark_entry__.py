"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` exposes
one entry per implemented operator from SURVEY §2 (and the pipeline
extensions); ``oracle_sql()`` gives the DuckDB-equivalent SQL for each.
Implementations live in ``polars_nexpresso_spark.queries``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: relational tables → packed hierarchy → cross-level enrich."""
    from polars_nexpresso_spark.queries import q_enrich_stats

    return q_enrich_stats(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from polars_nexpresso_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from polars_nexpresso_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
