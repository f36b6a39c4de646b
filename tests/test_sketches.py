"""Tests for the mergeable HLL distinct-count sketch helpers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from polars_nexpresso_spark.functions.sketches import (
    merge_sketches,
    sketch_distinct,
)


@pytest.fixture()
def corpus(spark):
    # 3 sources with known distinct url counts (overlapping duplicates)
    return spark.range(30_000).select(
        (F.col("id") % 3).cast("string").alias("source"),
        F.concat(F.lit("u"), (F.col("id") % 4_000).cast("string")).alias(
            "url"
        ),
    )


def test_sketch_estimate_within_tolerance(corpus):
    got = {
        r["source"]: r["approx_distinct"]
        for r in sketch_distinct(corpus, ["source"], "url").collect()
    }
    exact = {
        r["source"]: r["n"]
        for r in corpus.groupBy("source")
        .agg(F.countDistinct("url").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for s, est in got.items():
        assert abs(est - exact[s]) / exact[s] < 0.05, (s, est, exact[s])


def test_incremental_union_matches_one_shot(spark, corpus):
    """Per-increment sketches unioned == one-shot sketch (lossless merge
    at equal lg_k): identical estimates, not merely close ones."""
    # split into two increments by a deterministic hash of the value
    h = F.abs(F.xxhash64("url")) % 2
    parts = [corpus.filter(h == i) for i in (0, 1)]
    sketches = [
        sketch_distinct(p, ["source"], "url", estimate_col=None)
        for p in parts
    ]
    merged = merge_sketches(sketches[0].unionByName(sketches[1]), ["source"])
    one_shot = sketch_distinct(corpus, ["source"], "url")
    m = {r["source"]: r["approx_distinct"] for r in merged.collect()}
    o = {r["source"]: r["approx_distinct"] for r in one_shot.collect()}
    assert m == o


def test_sketch_validates_lg_k(corpus):
    with pytest.raises(ValueError, match="lg_k"):
        sketch_distinct(corpus, ["source"], "url", lg_k=2)


# --- count-min frequency sketches -------------------------------------------


def test_cms_probe_brackets_exact_counts(spark):
    """The driver probe replays Spark's bucket hashing: every estimate
    must be >= the true count (CMS guarantee — violated immediately if
    the hash replay diverges) and <= true + eps * total."""
    from pyspark.sql import functions as F

    from polars_nexpresso_spark.functions.sketches import (
        cms_estimate,
        sketch_frequencies,
    )

    rows = []
    truth = {}
    for i, (tok, n) in enumerate(
        [("alpha", 500), ("beta", 120), ("gamma", 37), ("delta", 1)]
    ):
        truth[tok] = n
        rows.extend((tok,) for _ in range(n))
    # filler tail of singletons
    rows.extend((f"tail{i}",) for i in range(400))
    df = spark.createDataFrame(rows, "token string").withColumn(
        "grp", F.lit("g")
    )
    sk = sketch_frequencies(
        df, ["grp"], "token", eps=0.001, confidence=0.99
    ).collect()[0]["cms"]
    total = sum(truth.values()) + 400
    est = cms_estimate(sk, list(truth) + ["never_seen"])
    for tok, n in truth.items():
        assert est[tok] >= n, (tok, est[tok], n)
        assert est[tok] <= n + 0.001 * total + 1, (tok, est[tok], n)
    assert est["never_seen"] <= 0.001 * total + 1


def test_cms_merge_equals_one_shot_byte_exact(spark):
    """Merging per-increment sketches inside Spark must reproduce the
    one-shot sketch of the concatenated data byte for byte (same seed
    => same hash functions => linear tables)."""
    from pyspark.sql import functions as F

    from polars_nexpresso_spark.functions.sketches import (
        merge_frequency_sketches,
        sketch_frequencies,
    )

    rows = [(f"t{i % 50}", "s1" if i % 2 == 0 else "s2") for i in range(2000)]
    df = spark.createDataFrame(rows, "token string, increment string")
    kw = dict(eps=0.01, confidence=0.9, seed=7)
    per_inc = sketch_frequencies(
        df.withColumn("grp", F.lit("g")),
        ["grp", "increment"],
        "token",
        **kw,
    ).drop("increment")
    merged = merge_frequency_sketches(per_inc, ["grp"]).collect()[0]["cms"]
    one_shot = sketch_frequencies(
        df.withColumn("grp", F.lit("g")), ["grp"], "token", **kw
    ).collect()[0]["cms"]
    assert bytes(merged) == bytes(one_shot)


def test_cms_merge_rejects_mixed_geometry(spark):
    from pyspark.sql import functions as F

    from polars_nexpresso_spark.functions.sketches import (
        merge_frequency_sketches,
        sketch_frequencies,
    )

    df = spark.createDataFrame([("a",), ("b",)], "token string").withColumn(
        "grp", F.lit("g")
    )
    s1 = sketch_frequencies(df, ["grp"], "token", eps=0.01)
    s2 = sketch_frequencies(df, ["grp"], "token", eps=0.02)
    with pytest.raises(Exception, match="geometry|seed"):
        merge_frequency_sketches(s1.union(s2), ["grp"]).collect()


def test_cms_validation(spark):
    from pyspark.sql import functions as F

    from polars_nexpresso_spark.functions.sketches import sketch_frequencies

    df = spark.createDataFrame([("a",)], "token string").withColumn(
        "grp", F.lit("g")
    )
    with pytest.raises(ValueError, match="eps and confidence"):
        sketch_frequencies(df, ["grp"], "token", eps=0.0)


# --- histogram quantile sketches ----------------------------------------------


def _qvals(spark):
    import random

    rng = random.Random(11)
    rows = [
        ("a", rng.uniform(0, 1)) for _ in range(3000)
    ] + [
        ("b", rng.betavariate(2, 5)) for _ in range(2000)
    ] + [
        ("a", -0.5), ("a", 1.7), ("a", None),  # out-of-range + NULL
    ]
    return spark.createDataFrame(rows, "src string, score double")


def test_quantile_sketch_merge_equals_one_shot(spark):
    from pyspark.sql import functions as F

    from polars_nexpresso_spark.functions.sketches import (
        merge_quantile_sketches,
        sketch_quantiles,
    )

    df = _qvals(spark).withColumn(
        "half", (F.xxhash64("score") % 2 == 0).cast("int")
    )
    one_shot = {
        r["src"]: r["qsketch"].asDict()
        for r in sketch_quantiles(
            df, ["src"], "score", lo=0.0, hi=1.0, num_bins=64
        ).collect()
    }
    incs = sketch_quantiles(
        df, ["src", "half"], "score", lo=0.0, hi=1.0, num_bins=64
    )
    merged = {
        r["src"]: r["qsketch"].asDict()
        for r in merge_quantile_sketches(incs, ["src"]).collect()
    }
    for src in ("a", "b"):
        a, b = one_shot[src], merged[src]
        for f in ("lo", "hi", "num_bins", "n", "n_below", "n_above",
                  "vmin", "vmax"):
            assert a[f] == b[f], (src, f, a[f], b[f])
        assert list(a["counts"]) == list(b["counts"])


def test_quantile_estimate_within_one_bin_width(spark):
    from polars_nexpresso_spark.functions.sketches import (
        quantile_estimate,
        sketch_quantiles,
    )

    df = _qvals(spark).filter("score is not null and score >= 0 and score < 1")
    exact = {
        (r["src"], q): v
        for r in df.groupBy("src")
        .agg(*[
            F.percentile("score", q).alias(f"q{int(q * 100)}")
            for q in (0.1, 0.5, 0.9, 0.99)
        ])
        .collect()
        for q, v in zip((0.1, 0.5, 0.9, 0.99),
                        (r["q10"], r["q50"], r["q90"], r["q99"]))
    }
    num_bins = 128
    width = 1.0 / num_bins
    sk = {
        r["src"]: r["qsketch"]
        for r in sketch_quantiles(
            df, ["src"], "score", lo=0.0, hi=1.0, num_bins=num_bins
        ).collect()
    }
    for src in ("a", "b"):
        est = quantile_estimate(sk[src], [0.1, 0.5, 0.9, 0.99])
        for q, e in est.items():
            assert abs(e - exact[(src, q)]) <= width + 1e-9, (
                src, q, e, exact[(src, q)]
            )


def test_quantile_sketch_out_of_range_and_nulls_visible(spark):
    from polars_nexpresso_spark.functions.sketches import (
        quantile_estimate,
        sketch_quantiles,
    )

    sk = {
        r["src"]: r["qsketch"]
        for r in sketch_quantiles(
            _qvals(spark), ["src"], "score", lo=0.0, hi=1.0
        ).collect()
    }
    a = sk["a"]
    assert a["n_below"] == 1 and a["n_above"] == 1
    assert a["vmin"] == -0.5 and a["vmax"] == 1.7
    assert a["n"] == 3002  # NULL not sketched
    # a rank inside the below-range mass returns the observed min
    assert quantile_estimate(a, [0.0])[0.0] == -0.5


def test_quantile_sketch_validates_and_merge_guards(spark):
    import pytest as _pytest

    from polars_nexpresso_spark.functions.sketches import (
        merge_quantile_sketches,
        sketch_quantiles,
    )

    df = _qvals(spark)
    with _pytest.raises(ValueError, match="lo < hi"):
        sketch_quantiles(df, ["src"], "score", lo=1.0, hi=0.0)
    with _pytest.raises(ValueError, match="num_bins"):
        sketch_quantiles(df, ["src"], "score", lo=0.0, hi=1.0, num_bins=1)
    a = sketch_quantiles(df, ["src"], "score", lo=0.0, hi=1.0, num_bins=32)
    b = sketch_quantiles(df, ["src"], "score", lo=0.0, hi=2.0, num_bins=32)
    with _pytest.raises(Exception, match="different\\s+geometry"):
        merge_quantile_sketches(a.unionByName(b), ["src"]).collect()
