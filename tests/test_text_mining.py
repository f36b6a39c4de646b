"""Round-8 text-mining additions: soft-dedup duplication weights,
per-document novelty (corpus-unique n-gram fraction), and PMI
collocation mining."""

from __future__ import annotations

import math

import pytest

from polars_nexpresso_spark.functions.dedup import duplication_weights
from polars_nexpresso_spark.functions.text import (
    pmi_collocations,
    unique_ngram_fraction,
)


# ---------------------------------------------------------------- weights


def test_duplication_weights_arithmetic(spark):
    """1/cluster_size per member, rounded to 9; singletons weigh 1.0."""
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4)],
        "doc_id long, cluster_id long",
    )
    got = {
        r["doc_id"]: (r["cluster_size"], r["sample_weight"])
        for r in duplication_weights(clusters, "doc_id").collect()
    }
    assert got == {
        1: (3, 0.333333333),
        2: (3, 0.333333333),
        3: (3, 0.333333333),
        4: (1, 1.0),
    }


def test_duplication_weights_mass_conservation(spark):
    """The defining invariant: summed weight per cluster == 1.0, so the
    corpus contributes one expected copy per near-dup cluster."""
    clusters = spark.createDataFrame(
        [(i, i % 3) for i in range(12)], "doc_id long, cluster_id long"
    )
    out = duplication_weights(clusters, "doc_id")
    per_cluster = {
        r["cluster_id"]: r["s"]
        for r in out.groupBy("cluster_id").sum("sample_weight")
        .withColumnRenamed("sum(sample_weight)", "s").collect()
    }
    for s in per_cluster.values():
        assert abs(s - 1.0) < 1e-6


def test_duplication_weights_validation_and_plan(spark):
    bad = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="cluster_id"):
        duplication_weights(bad, "doc_id")
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1)], "doc_id long, cluster_id long"
    )
    p = (
        duplication_weights(clusters, "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # hash aggregation + join, not a per-cluster window sort
    assert "Window" not in p


# ---------------------------------------------------------------- novelty


def test_unique_ngram_fraction_hand_corpus(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c"),   # grams: "a b" (shared with 2), "b c" (unique)
            (2, "a b x"),   # grams: "a b" (shared), "b x" (unique)
            (3, "q r s"),   # both grams unique
            (4, None),      # NULL text: 0 grams, NULL fraction
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_unique"], r["novelty_frac"])
        for r in unique_ngram_fraction(docs, "text", "doc_id", n=2).collect()
    }
    assert got[1] == (2, 1, 0.5)
    assert got[2] == (2, 1, 0.5)
    assert got[3] == (2, 2, 1.0)
    assert got[4] == (0, 0, None)


def test_unique_ngram_fraction_repeated_grams_count_once(spark):
    """word_ngrams dedups within a doc, so a doc repeating its own gram
    still counts it once — and a gram shared by two docs is non-unique
    for both."""
    docs = spark.createDataFrame(
        [(1, "x y x y"), (2, "x y z")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_unique"])
        for r in unique_ngram_fraction(docs, "text", "doc_id", n=2).collect()
    }
    # doc 1 grams: {"x y", "y x"}; doc 2 grams: {"x y", "y z"}
    assert got[1] == (2, 1)
    assert got[2] == (2, 1)


def test_unique_ngram_fraction_short_doc_convention(spark):
    """Documents shorter than n tokens yield their full token sequence
    as a single shingle (the word_ngrams convention), so they still
    participate — with one gram."""
    docs = spark.createDataFrame(
        [(1, "solo"), (2, "a b c d e")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_unique"], r["novelty_frac"])
        for r in unique_ngram_fraction(docs, "text", "doc_id", n=3).collect()
    }
    assert got[1] == (1, 1, 1.0)
    assert got[2] == (3, 3, 1.0)


def test_unique_ngram_fraction_validation_and_plan(spark):
    docs = spark.createDataFrame(
        [(1, "payload text here")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="n must be"):
        unique_ngram_fraction(docs, "text", "doc_id", n=0)
    with pytest.raises(ValueError, match="not both"):
        unique_ngram_fraction(docs, "missing", "doc_id")
    out = unique_ngram_fraction(docs, "text", "doc_id")
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in p
    # the text payload never rides an exchange — hashes do
    for line in p.splitlines():
        if "Exchange" in line:
            assert "text#" not in line, f"text rode an exchange: {line}"


# ------------------------------------------------------------ collocations


def test_pmi_collocations_hand_corpus(spark):
    """PMI formula replayed by hand: ln(c_ab · Nu² / (Nb · ca · cb))."""
    docs = spark.createDataFrame(
        [
            (1, "new york new york"),
            (2, "new york is big"),
            (3, "the the the the"),
        ],
        "doc_id long, text string",
    )
    rows = pmi_collocations(docs, "text", k=10, min_count=2).collect()
    got = {(r["w1"], r["w2"]): (r["pair_count"], r["pmi"]) for r in rows}
    # counts: unigrams — new:3 york:3 is:1 big:1 the:4 -> Nu=12
    # bigrams (adjacent, with duplicates): doc1 3, doc2 3, doc3 3 -> Nb=9
    # "new york" appears 3x; "the the" 3x; "york new" 1x (below floor)
    assert got[("new", "york")][0] == 3
    exp_ny = round(math.log(3 * 12.0 * 12.0 / (9.0 * 3 * 3)), 9)
    assert got[("new", "york")][1] == pytest.approx(exp_ny, abs=1e-9)
    exp_tt = round(math.log(3 * 12.0 * 12.0 / (9.0 * 4 * 4)), 9)
    assert got[("the", "the")][1] == pytest.approx(exp_tt, abs=1e-9)
    assert ("york", "new") not in got  # min_count floor
    # ranking: higher pmi first
    ranks = {(r["w1"], r["w2"]): r["rank"] for r in rows}
    assert ranks[("new", "york")] < ranks[("the", "the")]


def test_pmi_collocations_short_and_null_docs(spark):
    """Single-token, empty, and NULL docs contribute no bigrams and do
    not crash the zip/slice arithmetic."""
    docs = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, None), (4, "pair here pair here")],
        "doc_id long, text string",
    )
    rows = pmi_collocations(docs, "text", k=5, min_count=2).collect()
    got = {(r["w1"], r["w2"]) for r in rows}
    # bigrams: (pair,here) x2, (here,pair) x1 — only the first clears
    # the floor; the degenerate docs contribute nothing
    assert got == {("pair", "here")}


def test_pmi_collocations_validation(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="k must be"):
        pmi_collocations(docs, "text", k=0)
    with pytest.raises(ValueError, match="min_count"):
        pmi_collocations(docs, "text", min_count=0)


def test_pmi_collocations_totals_are_broadcast(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b a b")], "doc_id long, text string"
    )
    out = pmi_collocations(docs, "text", k=5, min_count=2)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in p or "BroadcastNestedLoopJoin" in p


def test_soft_dedup_sample_composition(spark):
    """The registry composition: weights feed Gumbel selection — the key
    replays the md5 arithmetic on ln(weight), and weight stays
    1/cluster_size through the chain."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    from polars_nexpresso_spark.functions.sampling import gumbel_topk

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3)], "doc_id long, cluster_id long"
    )
    weighted = duplication_weights(clusters, "doc_id").withColumn(
        "score", F.log("sample_weight")
    )
    got = {
        r["doc_id"]: r
        for r in gumbel_topk(
            weighted, "score", "doc_id", k=3, temperature=1.0
        ).collect()
    }
    assert got[1]["sample_weight"] == 0.5 and got[3]["sample_weight"] == 1.0
    # replay one gumbel key by hand: u from md5('42:<id>') mod 1e6
    h = int(hashlib.md5(b"42:3").hexdigest()[:15], 16) % 1_000_000
    u = (h + 0.5) / 1_000_000.0
    exp = round(math.log(1.0) / 1.0 - math.log(-math.log(u)), 6)
    assert got[3]["gumbel_key"] == pytest.approx(exp, abs=1e-9)


# ----------------------------------------------------- fraction decontam


def test_train_overlap_fractions_hand_corpus(spark):
    from polars_nexpresso_spark.functions.dedup import (
        train_overlap_fractions,
    )

    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),  # grams: 2 of 3 hit (n=2... see n)
            (2, "zeta eta theta"),          # no overlap
            (3, None),                      # no shingles
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_hits"], r["overlap_frac"])
        for r in train_overlap_fractions(
            train, eval_df, "text", "doc_id", n=2
        ).collect()
    }
    # eval 2-grams: {alpha beta, beta gamma}
    # doc1 2-grams: {alpha beta, beta gamma, gamma delta} -> 2/3
    assert got[1] == (3, 2, 0.666666667)
    assert got[2] == (2, 0, 0.0)
    assert got[3] == (0, 0, None)


def test_decontaminate_by_fraction_threshold_and_any_hit_limit(spark):
    from polars_nexpresso_spark.functions.dedup import (
        decontaminate,
        decontaminate_by_fraction,
    )

    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),           # frac 2/3
            (2, "alpha beta x y z w q r s t u v"),   # frac 1/11 ~ 0.09
            (3, "clean text with nothing shared"),
            (4, None),                               # always survives
        ],
        "doc_id long, text string",
    )
    # tolerant threshold keeps the doc with one incidental collision
    kept = {
        r["doc_id"]
        for r in decontaminate_by_fraction(
            train, eval_df, "text", "doc_id", n=2, max_frac=0.5
        ).collect()
    }
    assert kept == {2, 3, 4}
    # tiny threshold converges to the any-hit rule
    strict = {
        r["doc_id"]
        for r in decontaminate_by_fraction(
            train, eval_df, "text", "doc_id", n=2, max_frac=1e-9
        ).collect()
    }
    anyhit = {
        r["doc_id"]
        for r in decontaminate(
            train, eval_df, "text", "doc_id", mode="ngram", n=2
        ).collect()
    }
    # NULL-text doc: measurably-nothing survives the fraction rule by
    # contract; the any-hit path also keeps it (no shingles, no hit)
    assert strict == anyhit == {3, 4}
    with pytest.raises(ValueError, match="max_frac"):
        decontaminate_by_fraction(
            train, eval_df, "text", "doc_id", max_frac=0.0
        )


# -------------------------------------------------------------- containment


def test_containment_pairs_catches_what_jaccard_misses(spark):
    """The defining case: a short doc quoted whole inside a long one —
    containment 1.0, Jaccard far below any usable threshold."""
    from polars_nexpresso_spark.functions.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"tok{i} tok{i+1} filler{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, quote), (2, filler + " " + quote + " " + filler),
         (3, "unrelated text entirely different words")],
        "doc_id long, text string",
    )
    cont = containment_pairs(docs, "text", "doc_id", n=3, threshold=0.9)
    got = {(r["inner_id"], r["outer_id"]): r["containment"]
           for r in cont.collect()}
    assert got.get((1, 2)) == 1.0
    jac = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    assert jac.count() == 0  # symmetric Jaccard is blind to inclusion


def test_containment_pairs_orientation_and_ties(spark):
    """inner_id is the smaller shingle set; equal sizes orient by id."""
    from polars_nexpresso_spark.functions.dedup import containment_pairs

    docs = spark.createDataFrame(
        [(5, "a b c d"), (9, "a b c d")],  # identical -> tie -> (5, 9)
        "doc_id long, text string",
    )
    rows = containment_pairs(docs, "text", "doc_id", n=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["inner_id"], r["outer_id"], r["containment"]) == (5, 9, 1.0)


def test_containment_pairs_threshold_validation(spark):
    from polars_nexpresso_spark.functions.dedup import containment_pairs

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="threshold"):
        containment_pairs(docs, "text", "doc_id", threshold=0.0)


def test_containment_dominates_jaccard_metamorphic(spark):
    """containment = |∩|/min ≥ |∩|/union = jaccard for every pair, so at
    any shared threshold the Jaccard pair set is a SUBSET of the
    containment pair set — checked on a corpus mixing copies, subsets,
    overlaps, and disjoint docs."""
    from polars_nexpresso_spark.functions.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    base = "w1 w2 w3 w4 w5 w6 w7 w8"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),                          # exact copy
            (3, base + " extra tail tokens"),   # superset
            (4, "w1 w2 w3 w4"),                 # subset
            (5, "w5 w6 w7 w8 other words"),     # partial overlap
            (6, "entirely different content here"),
        ],
        "doc_id long, text string",
    )
    for thr in (0.5, 0.8, 1.0):
        jac = {
            (r["id_a"], r["id_b"])
            for r in ngram_jaccard_pairs(
                docs, "text", "doc_id", n=2, threshold=thr
            ).collect()
        }
        cont = {
            tuple(sorted((r["inner_id"], r["outer_id"])))
            for r in containment_pairs(
                docs, "text", "doc_id", n=2, threshold=thr
            ).collect()
        }
        assert jac <= cont, f"threshold {thr}: {jac - cont} missing"
    # and the subset relation is strict here: doc4 ⊂ doc1 at 1.0
    assert (1, 4) in cont and (1, 4) not in jac


# ---------------------------------------------------------------------------
# round-9: oov_rate + lexical_diversity
# ---------------------------------------------------------------------------


def test_oov_rate_semantics_and_nulls(spark):
    from polars_nexpresso_spark.functions.text import oov_rate

    df = spark.createDataFrame(
        [
            (1, "a", "a a a b"),      # 4 tokens; vocab(2) = {a, b}? see below
            (2, "a", "a rare1"),
            (3, "b", "a b rare2 rare2 rare2"),
            (4, "b", None),
            (5, "b", ""),
        ],
        "doc_id long, source string, text string",
    )
    # corpus freqs: a=5, rare2=3, b=2, rare1=1 -> vocab_size=2 keeps {a, rare2}
    out = {
        r["source"]: (r["n_tokens"], r["n_oov"], r["oov_rate"])
        for r in oov_rate(df, "text", "source", vocab_size=2).collect()
    }
    assert out["a"] == (6, 2, pytest.approx(2 / 6))   # b, rare1 are OOV
    assert out["b"] == (5, 1, pytest.approx(1 / 5))   # b is OOV
    # validation
    with pytest.raises(ValueError, match="vocab_size"):
        oov_rate(df, "text", "source", vocab_size=0)
    with pytest.raises(ValueError, match="columns"):
        oov_rate(df, "body", "source", vocab_size=2)


def test_oov_rate_vocab_tie_break_alphabetical(spark):
    from polars_nexpresso_spark.functions.text import oov_rate

    df = spark.createDataFrame(
        [(1, "s", "x y")], "doc_id long, source string, text string"
    )
    # x and y tie at freq 1; vocab_size=1 must keep 'x' (alphabetical)
    row = oov_rate(df, "text", "source", vocab_size=1).collect()[0]
    assert (row["n_tokens"], row["n_oov"]) == (2, 1)


def test_lexical_diversity_semantics(spark):
    from polars_nexpresso_spark.functions.text import lexical_diversity

    df = spark.createDataFrame(
        [
            (1, "a b a c"),      # 4 tokens, 3 types, hapax {b, c}
            (2, "x x x"),        # 3 tokens, 1 type, no hapax
            (3, None),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (
            r["n_tokens"], r["n_types"], r["ttr"], r["hapax_ratio"]
        )
        for r in lexical_diversity(df, "text", "doc_id").collect()
    }
    assert out[1] == (4, 3, pytest.approx(0.75), pytest.approx(0.5))
    assert out[2] == (3, 1, pytest.approx(1 / 3), pytest.approx(0.0))
    assert out[3] == (0, 0, None, None)
    assert out[4] == (0, 0, None, None)


def test_lexical_diversity_is_map_side(spark):
    from polars_nexpresso_spark.functions.text import lexical_diversity

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = (
        lexical_diversity(df, "text", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_oov_annotate_stream_matches_batch_and_aggregates_to_oov_rate(spark):
    """Per-doc annotations aggregate exactly to oov_rate's per-group
    report (same frozen vocabulary), and a real availableNow drain
    yields the same rows as the batch frame."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from polars_nexpresso_spark.functions.text import (
        oov_annotate_stream,
        oov_rate,
    )

    df = spark.createDataFrame(
        [
            (1, "a", "a a a b"),
            (2, "a", "a rare1"),
            (3, "b", "a b rare2 rare2 rare2"),
            (4, "b", None),
            (5, "b", ""),
        ],
        "doc_id long, source string, text string",
    )
    ann = oov_annotate_stream(df, "text", df, vocab_size=2)
    rows = {r["doc_id"]: r for r in ann.collect()}
    assert rows[1]["n_tokens"] == 4 and rows[1]["n_oov"] == 1  # b OOV
    assert rows[4]["n_tokens"] == 0 and rows[4]["oov_rate"] is None
    assert rows[5]["n_tokens"] == 0 and rows[5]["oov_rate"] is None
    # aggregate == oov_rate (groups with tokens)
    agg = {
        r["source"]: (r["n_tokens"], r["n_oov"])
        for r in ann.filter("n_tokens > 0")
        .groupBy("source")
        .agg(
            F.sum("n_tokens").alias("n_tokens"), F.sum("n_oov").alias("n_oov")
        )
        .collect()
    }
    want = {
        r["source"]: (r["n_tokens"], r["n_oov"])
        for r in oov_rate(df, "text", "source", vocab_size=2).collect()
    }
    assert agg == want
    # real stream drain == batch
    tmp = tempfile.mkdtemp(prefix="pns_oov_stream_")
    try:
        df.repartition(2).write.mode("overwrite").parquet(f"{tmp}/in")
        stream = spark.readStream.schema(df.schema).parquet(f"{tmp}/in")
        out = oov_annotate_stream(stream, "text", df, vocab_size=2)
        assert out.isStreaming
        q = (
            out.select("doc_id", "n_tokens", "n_oov", "oov_rate")
            .writeStream.format("memory")
            .queryName("oov_stream_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["doc_id"], r["n_tokens"], r["n_oov"], r["oov_rate"])
            for r in spark.table("oov_stream_out").collect()
        }
        expect = {
            (r["doc_id"], r["n_tokens"], r["n_oov"], r["oov_rate"])
            for r in ann.collect()
        }
        assert got == expect
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    with pytest.raises(ValueError, match="vocab_size"):
        oov_annotate_stream(df, "text", df, vocab_size=0)
