"""BPE tokenizer training/encoding: hand-computed classic corpus,
determinism, the concat-roundtrip invariant, guards, and the
map-side-only encode plan pin."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from polars_nexpresso_spark.functions.bpe import (
    bpe_encode,
    train_bpe,
    word_frequencies,
)


def _classic(spark):
    # The Sennrich walkthrough shape: "low" x5, "lower" x2, "newest" x6,
    # "widest" x3 — one doc per occurrence keeps frequencies obvious.
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    return spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], ["doc_id", "text"]
    )


def test_word_frequencies_one_agg(spark):
    wf = {
        r["word"]: r["freq"]
        for r in word_frequencies(_classic(spark), "text").collect()
    }
    assert wf == {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_train_bpe_classic_first_merges(spark):
    merges = train_bpe(
        _classic(spark), "text", num_merges=4, min_count=1
    ).collect()
    got = [(r["rank"], r["left"], r["right"], r["pair_freq"]) for r in merges]
    # (e,s) appears in newest(6)+widest(3) = 9 — the clear first merge;
    # then (es,t) 9, then (est,</w>) 9 (lexicographic ties resolved
    # deterministically), then (l,o) 7 from low+lower.
    assert got[0] == (0, "e", "s", 9)
    assert got[1] == (1, "es", "t", 9)
    assert got[2] == (2, "est", "</w>", 9)
    assert got[3] == (3, "l", "o", 7)


def test_train_bpe_deterministic_across_layouts(spark):
    df = _classic(spark)
    a = train_bpe(df, "text", num_merges=6, min_count=1).collect()
    b = train_bpe(
        df.repartition(7), "text", num_merges=6, min_count=1
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_train_bpe_stops_when_no_repeating_pair(spark):
    df = spark.createDataFrame([(1, "ab cd")], ["doc_id", "text"])
    merges = train_bpe(df, "text", num_merges=10, min_count=1)
    # every pair occurs once -> nothing to merge
    assert merges.count() == 0


def test_bpe_encode_applies_merges_and_roundtrips(spark):
    train = _classic(spark)
    merges = train_bpe(train, "text", num_merges=8, min_count=1)
    test_df = spark.createDataFrame(
        [(1, "newest lowest"), (2, None), (3, "")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["bpe"]
        for r in bpe_encode(test_df, "text", merges).collect()
    }
    assert out[2] is None and out[3] == []
    toks = out[1]
    # "newest" was fully learned -> single token
    assert "newest</w>" in toks
    # roundtrip invariant: concatenated tokens == the pretokenized words
    # with </w> sentinels (the GPT-2-style pretokenizer keeps the
    # leading space as part of the second word)
    assert "".join(toks) == "newest</w> lowest</w>"
    # "lowest": "low" merged (l,o then lo,w) and "est" learned, "w"
    # boundary unseen as (est,</w>) was applied inside 'newest' too —
    # whatever the split, no token crosses the </w> sentinel
    for t in toks:
        assert t.count("</w>") <= 1


def test_bpe_encode_batch_matches_single_row(spark):
    """The per-batch cache must not change results."""
    train = _classic(spark)
    merges = train_bpe(train, "text", num_merges=5, min_count=1)
    many = spark.createDataFrame(
        [(i, "newest widest low") for i in range(50)], ["doc_id", "text"]
    )
    rows = bpe_encode(many, "text", merges).select("bpe").collect()
    assert len({tuple(r["bpe"]) for r in rows}) == 1


def test_train_bpe_guards(spark):
    df = _classic(spark)
    with pytest.raises(ValueError, match="num_merges"):
        train_bpe(df, "text", num_merges=0)
    with pytest.raises(ValueError, match="max_words"):
        train_bpe(df, "text", num_merges=2, min_count=1, max_words=2)
    with pytest.raises(ValueError, match="not in DataFrame"):
        train_bpe(df, "body", num_merges=2)


def test_bpe_encode_plan_is_map_side(spark):
    merges = train_bpe(_classic(spark), "text", num_merges=3, min_count=1)
    df = spark.createDataFrame([(1, "low")], ["doc_id", "text"])
    plan = (
        bpe_encode(df, "text", merges)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan or "Project" in plan


def _naive_merge_loop(words, num_merges):
    """The pre-round-8 recompute-everything formulation, kept as the
    equivalence oracle for the incremental trainer."""
    from polars_nexpresso_spark.functions.bpe import (
        _merge_word,
        _pair_stats,
    )

    words = list(words)
    merges = []
    for rank in range(num_merges):
        stats = _pair_stats(words)
        if not stats:
            break
        best_freq = max(stats.values())
        if best_freq < 2:
            break
        best = min(p for p, c in stats.items() if c == best_freq)
        merges.append((rank, best[0], best[1], best[0] + best[1], best_freq))
        words = [(_merge_word(s, best), f) for s, f in words]
    return merges


@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcd", min_size=1, max_size=8),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=1, max_value=40),
)
@settings(max_examples=60, deadline=None)
def test_incremental_merge_loop_matches_naive(raw_words, num_merges):
    """The incremental pair-count trainer must produce a byte-identical
    merge table to the recompute-everything loop on arbitrary
    vocabularies — the refactor is exact, not approximate."""
    from polars_nexpresso_spark.functions.bpe import _END, _merge_loop

    # dedupe words like the real frequency table does (keep max freq)
    freq: dict = {}
    for w, f in raw_words:
        freq[w] = max(freq.get(w, 0), f)
    words = [(tuple(w) + (_END,), f) for w, f in sorted(freq.items())]
    got = _merge_loop([(s, f) for s, f in words], num_merges)
    want = _naive_merge_loop(words, num_merges)
    assert got == want
