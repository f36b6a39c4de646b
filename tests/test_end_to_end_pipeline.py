"""End-to-end composition of the round-7 pipeline stages on real testdata.

Every stage is individually oracle-checked; this suite checks that the
stages COMPOSE — structural invariants that must hold when the operators
feed each other the way a production corpus build would:

  boilerplate strip → exact-substring removal → near-dup clusters with
  keep-best election → leakage-free split → temperature mixture →
  token budget → sequence packing.

(`training_keepset` hash-checks a five-stage composition against one
oracle; this suite covers the round-7 stages, whose composition has no
single-SQL oracle, with explicit invariants instead.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pipeline(spark):
    from polars_nexpresso_spark.functions.dedup import (
        dedup_clusters,
        keep_best_in_clusters,
        minhash_lsh_pairs,
        remove_boilerplate_lines,
        remove_duplicated_windows,
    )
    from polars_nexpresso_spark.functions.sampling import hash_split
    from polars_nexpresso_spark.sources.io import read_table, spread

    docs = spread(read_table(spark, SF, "documents")).select(
        "doc_id", "source", "text"
    )
    n_docs = docs.count()

    # 1. Strip corpus-ubiquitous tokens (the synthetic corpus has no
    #    newline structure, so the token unit exercises the operator).
    boiler = remove_boilerplate_lines(
        docs, "text", "doc_id", min_docs=None, min_doc_frac=0.5,
        delimiter=" ",
    )
    cleaned = (
        docs.select("doc_id", "source")
        .join(boiler.select("doc_id", "clean_text"), on="doc_id")
        .withColumnRenamed("clean_text", "text")
    )

    # 2. Remove corpus-repeated exact spans from the cleaned text.
    despanned = (
        cleaned.select("doc_id", "source")
        .join(
            remove_duplicated_windows(
                cleaned, "text", "doc_id", window=4
            ).select("doc_id", "clean_text", "n_kept"),
            on="doc_id",
        )
        .withColumnRenamed("clean_text", "text")
    )

    # 3. Near-dup clusters over the PROCESSED text, keep-best by length.
    pairs = minhash_lsh_pairs(
        despanned, "text", "doc_id", n=3, num_hashes=32, bands=8,
        threshold=0.8,
    )
    clusters = dedup_clusters(despanned.select("doc_id"), pairs, "doc_id")
    scored = despanned.withColumn("quality", F.length("text"))
    decisions = keep_best_in_clusters(scored, clusters, "doc_id", "quality")

    # 4. Leakage-free split: hash the CLUSTER id.
    split = hash_split(decisions, "cluster_id")

    return {
        "docs": docs,
        "n_docs": n_docs,
        "boiler": boiler,
        "despanned": despanned,
        "clusters": clusters,
        "decisions": decisions,
        "split": split,
    }


def test_no_row_loss_through_text_stages(pipeline):
    """Both text-rewriting stages keep every document (empty survivors
    included) and the cluster labeling covers the full corpus."""
    n = pipeline["n_docs"]
    assert pipeline["boiler"].count() == n
    assert pipeline["despanned"].count() == n
    assert pipeline["clusters"].count() == n
    assert pipeline["decisions"].count() == n


def test_exactly_one_keeper_per_cluster(pipeline):
    per = (
        pipeline["decisions"]
        .groupBy("cluster_id")
        .agg(F.sum(F.col("keep").cast("int")).alias("k"))
        .collect()
    )
    assert per and all(r["k"] == 1 for r in per)


def test_keeper_is_longest_processed_text(pipeline):
    """The election ran on the PROCESSED text: in every multi-member
    cluster the keeper's post-processing length is maximal."""
    joined = pipeline["decisions"].join(
        pipeline["despanned"].select(
            "doc_id", F.length("text").alias("len")
        ),
        on="doc_id",
    )
    rows = joined.collect()
    best: dict = {}
    for r in rows:
        c = r["cluster_id"]
        if c not in best or r["len"] > best[c]:
            best[c] = r["len"]
    for r in rows:
        if r["keep"]:
            assert r["len"] == best[r["cluster_id"]], r


def test_split_is_cluster_disjoint_and_deterministic(pipeline, spark):
    from polars_nexpresso_spark.functions.sampling import hash_split

    split = pipeline["split"]
    per = (
        split.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n"))
        .collect()
    )
    assert all(r["n"] == 1 for r in per)
    # deterministic: a second evaluation produces the identical mapping
    again = {
        r["doc_id"]: r["split"]
        for r in hash_split(pipeline["decisions"], "cluster_id").collect()
    }
    first = {r["doc_id"]: r["split"] for r in split.collect()}
    assert again == first


def test_budget_fill_and_packing_on_survivors(pipeline, spark):
    """Token budget over the kept training docs, then sequence packing:
    the budget bounds the selection, and no packed sequence overflows."""
    from polars_nexpresso_spark.functions.sampling import take_token_budget
    from polars_nexpresso_spark.functions.seqpack import sequence_pack
    from polars_nexpresso_spark.functions.text import token_count

    survivors = (
        pipeline["split"]
        .filter((F.col("split") == "train") & F.col("keep"))
        .join(pipeline["despanned"].select("doc_id", "text"), on="doc_id")
    )
    budget = 2000
    filled = take_token_budget(
        survivors, "text", "doc_id", budget=budget, n_buckets=8
    )
    total = filled.agg(F.sum("n_tokens")).collect()[0][0]
    assert total is not None and total <= budget

    counted = survivors.join(
        filled.select("doc_id"), on="doc_id", how="left_semi"
    ).withColumn("n_tokens", token_count(F.col("text")))
    packed = sequence_pack(
        counted, "n_tokens", "doc_id", budget=64, num_shards=4
    )
    fills = packed.groupBy("shard", "seq_id").agg(
        F.max("seq_fill").alias("fill")
    )
    assert all(r["fill"] <= 64 for r in fills.collect())
    assert packed.count() == counted.filter(F.col("n_tokens") <= 64).count()
