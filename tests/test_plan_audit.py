"""Tests for the plan-antipattern auditor and the key-skew diagnostic."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_nexpresso_spark.plans.audit import audit_plan
from polars_nexpresso_spark.plans.stats import key_skew_stats


def test_audit_flags_cartesian_and_global_sort(spark):
    a = spark.range(10)
    b = spark.range(10).withColumnRenamed("id", "id2")
    warnings = audit_plan(a.crossJoin(b))
    assert any(w.startswith("cartesian-product") for w in warnings) or any(
        w.startswith("nested-loop-join") for w in warnings
    )
    # orderBy("id") over Range is optimized away (already ordered) — sort
    # on a derived key so a real range-exchange survives into the plan
    assert any(
        w.startswith("global-sort")
        for w in audit_plan(a.orderBy((F.col("id") % 7).asc()))
    )


def test_audit_flags_python_row_udf(spark):
    from pyspark.sql.functions import udf

    plain = udf(lambda x: x + 1, "long")
    df = spark.range(10).select(plain(F.col("id")).alias("y"))
    assert any(w.startswith("python-row-udf") for w in audit_plan(df))


def test_audit_clean_plan_and_exchange_budget(spark):
    df = spark.range(100).filter(F.col("id") % 2 == 0).select("id")
    assert audit_plan(df) == []
    grouped = spark.range(100).groupBy((F.col("id") % 5).alias("k")).count()
    assert audit_plan(grouped, max_exchanges=1) == []
    double = (
        grouped.groupBy((F.col("k") % 2).alias("j"))
        .count()
    )
    assert any(
        w.startswith("exchange-count")
        for w in audit_plan(double, max_exchanges=1)
    )


def test_key_skew_stats_ranks_hot_keys(spark):
    rows = [("hot",)] * 70 + [("warm",)] * 20 + [("cold",)] * 10
    df = spark.createDataFrame(rows, ["k"])
    out = key_skew_stats(df, ["k"], top_n=2).collect()
    assert [(r["k"], r["n_rows"]) for r in out] == [("hot", 70), ("warm", 20)]
    assert out[0]["share"] == 0.7
