"""Z-order writer: multi-column locality on disk, Morton arithmetic,
and the no-global-sort plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_nexpresso_spark.sources.io import write_ordered, write_zordered


def _grid(spark, side=64):
    """side×side grid scrambled so input order carries no locality."""
    rows = [
        (i, (i * 2654435761) % (side * side) % side,
         ((i * 2654435761) % (side * side)) // side)
        for i in range(side * side)
    ]
    return spark.createDataFrame(rows, "row_id long, x long, y long")


def _file_spans(spark, path, col):
    """Per part-file (max-min) span of ``col``, as fractions of the
    global range."""
    out = spark.read.parquet(path).withColumn(
        "__f", F.input_file_name()
    )
    rows = (
        out.groupBy("__f")
        .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
        .collect()
    )
    g = out.agg(F.min(col), F.max(col)).collect()[0]
    width = g[1] - g[0]
    return [(r["hi"] - r["lo"]) / width for r in rows]


def test_zorder_buys_locality_on_both_columns(spark, tmp_path):
    """The defining property: with 16 files over a 64×64 grid, z-order
    confines each file to a tile — BOTH columns' per-file spans stay
    well under the full range — while a plain x-sort leaves every file
    spanning the whole y range."""
    df = _grid(spark)
    zp, op = str(tmp_path / "z"), str(tmp_path / "o")
    write_zordered(df, zp, ["x", "y"], bits=6, n_files=16)
    write_ordered(df, op, "x", tiebreak_col="row_id", n_files=16)
    zx, zy = _file_spans(spark, zp, "x"), _file_spans(spark, zp, "y")
    oy = _file_spans(spark, op, "y")
    # every z-order file covers a bounded tile in x AND y
    assert max(zx) <= 0.55 and max(zy) <= 0.55
    # the x-sorted layout has no y locality at all
    assert min(oy) > 0.9
    # nothing lost: same rows back
    assert spark.read.parquet(zp).count() == 64 * 64


def test_zorder_roundtrip_and_key_not_persisted(spark, tmp_path):
    df = _grid(spark, side=16)
    p = str(tmp_path / "z2")
    write_zordered(df, p, ["x", "y"], bits=4, n_files=4)
    back = spark.read.parquet(p)
    assert back.columns == ["row_id", "x", "y"]
    assert sorted(r["row_id"] for r in back.collect()) == list(range(256))


def test_zorder_null_and_constant_columns(spark, tmp_path):
    """NULLs cluster at the curve origin; a constant column degrades
    gracefully to bucket 0 everywhere (the other column still orders
    the layout)."""
    rows = [(i, None if i % 5 == 0 else i % 32, 7) for i in range(200)]
    df = spark.createDataFrame(rows, "row_id long, x long, y long")
    p = str(tmp_path / "z3")
    write_zordered(df, p, ["x", "y"], bits=5, n_files=2)
    assert spark.read.parquet(p).count() == 200


def test_zorder_plan_is_range_partitioned_no_global_sort(spark, tmp_path):
    df = _grid(spark, side=16)
    z = (
        df.withColumn("__z", (F.col("x") + F.col("y")))
        .repartitionByRange(4, F.col("__z").asc())
        .sortWithinPartitions(F.col("__z").asc())
    )
    p = z._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in p
    # local sorts only — no Sort above the exchange (global sort shape)
    import re

    assert not re.search(r"Sort .*global=true", p)


def test_zorder_validation(spark, tmp_path):
    df = _grid(spark, side=8)
    with pytest.raises(ValueError, match=">= 2 columns"):
        write_zordered(df, str(tmp_path / "a"), ["x"])
    with pytest.raises(ValueError, match="not in DataFrame"):
        write_zordered(df, str(tmp_path / "b"), ["x", "missing"])
    with pytest.raises(ValueError, match="bits"):
        write_zordered(df, str(tmp_path / "c"), ["x", "y"], bits=40)
    with pytest.raises(ValueError, match="n_files"):
        write_zordered(df, str(tmp_path / "d"), ["x", "y"], n_files=0)


def test_zorder_quantile_bucketing_survives_skew(spark, tmp_path):
    """Uniform grids collapse under skew (most rows land in one cell of
    a heavy-tailed column); quantile bucketing keeps per-file locality
    on BOTH columns — measured as span over the value RANKS, the metric
    pruning actually sees under skew."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(7)
    # y heavy-tailed: 95% tiny values, 5% huge outliers
    rows = [
        (
            i,
            i % 64,
            rng.randint(0, 100) if rng.random() < 0.95
            else rng.randint(1_000_000, 2_000_000),
        )
        for i in range(4096)
    ]
    df = spark.createDataFrame(rows, "row_id long, x long, y long")
    qp = str(tmp_path / "zq")
    write_zordered(df, qp, ["x", "y"], bits=6, n_files=16,
                   bucketing="quantile")
    back = spark.read.parquet(qp).withColumn("__f", F.input_file_name())
    assert back.count() == 4096
    # rank-span per file on the skewed column: quantile cells bound it
    from pyspark.sql.window import Window

    ranked = back.withColumn(
        "__r", F.percent_rank().over(Window.orderBy("y", "row_id"))
    )
    spans = (
        ranked.groupBy("__f")
        .agg((F.max("__r") - F.min("__r")).alias("s"))
        .collect()
    )
    # every file's rank footprint is bounded well below the full range
    assert max(r["s"] for r in spans) <= 0.8
    # x locality: the sparse outlier cells legitimately produce one
    # small file spanning x (few rows, all x values), so the TYPICAL
    # file is the honest metric — median span stays tile-bounded
    xs = sorted(_file_spans(spark, qp, "x"))
    assert xs[len(xs) // 2] <= 0.6


def test_zorder_bucketing_validation(spark, tmp_path):
    df = _grid(spark, side=8)
    with pytest.raises(ValueError, match="bucketing"):
        write_zordered(df, str(tmp_path / "zb"), ["x", "y"],
                       bucketing="bogus")
    # quantile mode caps bits: the split-point pass is 2^bits - 1
    # doubles per column, useless past ~4096 cells
    with pytest.raises(ValueError, match="bits <= 12"):
        write_zordered(df, str(tmp_path / "zq"), ["x", "y"],
                       bits=13, bucketing="quantile")
