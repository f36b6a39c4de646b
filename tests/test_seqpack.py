"""Sequence packing (LLM sample packing) semantics.

Greedy first-fit-in-order within md5-hashed shards; a document larger than
the budget gets its own sequence; assignment is independent of input
partitioning (determinism at scale is the whole point).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_nexpresso_spark.functions.seqpack import sequence_pack


def _one_shard(spark, rows):
    """Pack a handcrafted (doc_id, n_tokens) set in ONE shard so the greedy
    walk order is the full id order."""
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = sequence_pack(df, "n_tokens", "doc_id", budget=100, num_shards=1)
    return {
        r["doc_id"]: (r["seq_id"], r["seq_fill"]) for r in out.collect()
    }


def test_greedy_walk_semantics(spark):
    got = _one_shard(
        spark,
        [(1, 40), (2, 50), (3, 20), (4, 90), (5, 10), (6, 5)],
    )
    # 40+50=90 fits; +20 would overflow -> seq 1; 20+90 overflows -> seq 2;
    # 90+10=100 fits exactly; +5 overflows -> seq 3
    assert got == {
        1: (0, 40),
        2: (0, 90),
        3: (1, 20),
        4: (2, 90),
        5: (2, 100),
        6: (3, 5),
    }


def test_oversized_doc_gets_own_sequence(spark):
    got = _one_shard(spark, [(1, 30), (2, 250), (3, 30)])
    assert got[1] == (0, 30)
    assert got[2] == (1, 250)  # over budget, placed alone, not truncated
    assert got[3] == (2, 30)


def test_budget_boundary_exact_fit(spark):
    got = _one_shard(spark, [(1, 100), (2, 100)])
    assert got[1] == (0, 100)
    assert got[2] == (1, 100)


def test_partitioning_invariance(spark):
    """The assignment depends only on (ids, tokens, budget, shards) — never
    on physical layout."""
    rows = [(i, (i * 37) % 120 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    a = sequence_pack(df.repartition(1), "n_tokens", "doc_id", budget=256, num_shards=4)
    b = sequence_pack(
        df.repartition(16, "n_tokens"), "n_tokens", "doc_id", budget=256, num_shards=4
    )
    ra = {tuple(r) for r in a.collect()}
    rb = {tuple(r) for r in b.collect()}
    assert ra == rb
    # every sequence respects the budget unless it is a single oversized doc
    fills = (
        a.groupBy("shard", "seq_id")
        .agg(F.max("seq_fill").alias("fill"), F.count("*").alias("n"))
        .collect()
    )
    for r in fills:
        assert r["fill"] <= 256 or r["n"] == 1


def test_validation_errors(spark):
    import pytest

    df = spark.createDataFrame([(1, 10)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError, match="budget"):
        sequence_pack(df, "n_tokens", "doc_id", budget=0)
    with pytest.raises(ValueError, match="num_shards"):
        sequence_pack(df, "n_tokens", "doc_id", budget=10, num_shards=0)
