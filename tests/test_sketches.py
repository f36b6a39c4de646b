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
