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


def test_daily_ingest_loop_with_persisted_indexes(spark, tmp_path):
    """The round-8 maintenance story end to end, two simulated days:

    day 0 — publish the reference: build the dedup index (bucketed
            fingerprints + LSH bands + meta) and the BM25 text index
            from the day-0 corpus;
    day 1 — a new crawl arrives: dedup it against the index (exact
            variant and near-dup of day-0 docs drop), decontaminate
            the survivors against an eval suite via the Bloom path,
            then APPEND the cleaned batch into both indexes;
    day 2 — a recrawl of a day-1 doc must now be caught by the
            extended dedup index, and BM25 over the extended text
            index must retrieve day-1 content with scores identical
            to an index rebuilt from scratch over days 0+1.
    """
    from polars_nexpresso_spark.functions.dedup import (
        build_dedup_index,
        decontaminate_bloom,
        dedup_against_index,
        extend_dedup_index,
    )
    from polars_nexpresso_spark.functions.retrieval import (
        bm25_against_index,
        build_text_index,
        extend_text_index,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "migrating geese assemble near the frozen river bank and three "
        "patient fishermen compare notes about the morning catch"
    )
    day0 = spark.createDataFrame(
        [(1, base), (2, "hash join strategies for analytical engines")],
        ["doc_id", "text"],
    )
    eval_suite = spark.createDataFrame(
        [(900, "benchmark question about window function spill behavior "
               "under memory pressure in distributed query engines")],
        ["qid", "text"],
    )
    build_dedup_index(
        day0, "text", "doc_id", "pns_e2e_didx",
        num_buckets=4, path=str(tmp_path / "didx"),
    )
    build_text_index(
        day0, "text", "doc_id", "pns_e2e_tidx",
        num_buckets=4, path=str(tmp_path / "tidx"),
    )
    try:
        day1 = spark.createDataFrame(
            [
                (10, base.upper()),                           # exact variant
                (11, base.replace("seventeen", "nineteen")),  # near-dup
                (12, "window aggregation with spill to disk"),
                # contaminated: contains the eval doc verbatim
                (13, "prefix " + eval_suite.first()["text"] + " suffix"),
            ],
            ["doc_id", "text"],
        )
        deduped = dedup_against_index(day1, "text", "doc_id", "pns_e2e_didx")
        assert sorted(r["doc_id"] for r in deduped.collect()) == [12, 13]
        # Snapshot for the REBUILD comparison below: `cleaned` is a lazy
        # plan that PROBES pns_e2e_didx, and appends recache dependent
        # plans — after the extends it would re-evaluate to empty (the
        # extend ops snapshot their own input internally; this checkpoint
        # is for the test's later reuse). persist() does NOT protect
        # here: the recache invalidates it; lineage truncation does.
        cleaned = decontaminate_bloom(
            deduped, eval_suite, "text"
        ).localCheckpoint()
        assert [r["doc_id"] for r in cleaned.collect()] == [12]

        extend_dedup_index(cleaned, "text", "doc_id", "pns_e2e_didx")
        extend_text_index(cleaned, "text", "doc_id", "pns_e2e_tidx")

        # day 2: a recrawl of the day-1 doc is now a known duplicate
        day2 = spark.createDataFrame(
            [(20, "WINDOW  aggregation with spill to disk"),
             (21, "genuinely new content about gardens")],
            ["doc_id", "text"],
        )
        out = dedup_against_index(day2, "text", "doc_id", "pns_e2e_didx")
        assert [r["doc_id"] for r in out.collect()] == [21]

        # extended text index == rebuild over day0 + cleaned day1
        build_text_index(
            day0.unionByName(cleaned), "text", "doc_id", "pns_e2e_tidx_r",
            num_buckets=4, path=str(tmp_path / "tidxr"),
        )
        got = [
            tuple(r)
            for r in bm25_against_index(
                spark, "pns_e2e_tidx", "window spill", k=5
            ).collect()
        ]
        want = [
            tuple(r)
            for r in bm25_against_index(
                spark, "pns_e2e_tidx_r", "window spill", k=5
            ).collect()
        ]
        assert got == want
        assert got and got[0][0] == 12  # day-1 content retrievable
    finally:
        for stem, sufs in (
            ("pns_e2e_didx", ("fp", "lsh", "meta")),
            ("pns_e2e_tidx", ("postings", "terms", "stats")),
            ("pns_e2e_tidx_r", ("postings", "terms", "stats")),
        ):
            for suf in sufs:
                spark.sql(f"DROP TABLE IF EXISTS {stem}_{suf}")
