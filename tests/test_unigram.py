"""Unigram-LM tokenizer: training invariants, the concat-roundtrip
contract, determinism, and the map-side encode plan — the same evidence
class as test_bpe.py (iterative algorithm, rows-only, no SQL oracle)."""

from __future__ import annotations

import pytest

from polars_nexpresso_spark.functions.unigram import (
    _viterbi,
    train_unigram,
    unigram_encode,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_viterbi_prefers_probable_pieces():
    import math

    logp = {
        "ab": math.log(0.4),
        "a": math.log(0.2),
        "b": math.log(0.2),
        "c": math.log(0.2),
    }
    # "abab": [ab, ab] scores 2*log(.4) > [a,b,a,b] 4*log(.2)
    assert _viterbi("abab", logp, 8) == ["ab", "ab"]
    assert _viterbi("cab", logp, 8) == ["c", "ab"]
    # unseen char falls back to itself (huge penalty, never a crash)
    assert _viterbi("axb", logp, 8) == ["a", "x", "b"]


def test_train_unigram_keeps_frequent_piece_and_roundtrip(spark):
    texts = ["ababab abab ab", "ababab ab", "ab abab cd"] * 5
    df = _docs(spark, texts)
    vocab = train_unigram(df, "text", vocab_size=8, min_count=1)
    rows = {r["piece"]: r for r in vocab.collect()}
    # every seen character survives, flagged is_char
    for ch in "abcd":
        assert ch in rows and rows[ch]["is_char"] is True
    # the dominant substring earns a multi-char piece (the BPE-regex
    # pretokens carry their leading space, so ' ab' counts)
    assert {"ab", "abab", " ab", " abab"} & set(rows)
    assert len(rows) <= 8
    # roundtrip: concatenated pieces reproduce the pretoken stream
    import re

    from polars_nexpresso_spark.functions.text import BPE_TOKEN_PATTERN

    pat = re.compile(BPE_TOKEN_PATTERN)
    for r in unigram_encode(df, "text", vocab).collect():
        assert "".join(r["pieces"]) == "".join(pat.findall(r["text"]))


def test_unigram_roundtrip_invariant_exact(spark):
    """The precise contract: pieces of each word concatenate back to
    the word (pretokens include their leading-space form from the BPE
    regex, so compare against the regex's own output)."""
    import re

    from polars_nexpresso_spark.functions.text import BPE_TOKEN_PATTERN

    texts = ["the quick brown fox", "pack my box with five dozen jugs"]
    df = _docs(spark, texts)
    vocab = train_unigram(df, "text", vocab_size=40, min_count=1)
    logp = {r["piece"]: r["logp"] for r in vocab.collect()}
    pat = re.compile(BPE_TOKEN_PATTERN)
    enc = {r["doc_id"]: r["pieces"] for r in
           unigram_encode(df, "text", vocab).collect()}
    for i, t in enumerate(texts):
        words = pat.findall(t.lower())
        assert "".join(enc[i]) == "".join(words)


def test_train_unigram_deterministic_across_partitionings(spark):
    texts = [f"w{i % 7} common common piece{i % 3}" for i in range(40)]
    a = train_unigram(
        _docs(spark, texts), "text", vocab_size=20, min_count=1
    ).collect()
    b = train_unigram(
        _docs(spark, texts).repartition(13), "text",
        vocab_size=20, min_count=1,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_unigram_compression_beats_chars(spark):
    """A trained vocabulary segments the corpus into FEWER pieces than
    character-level — the whole point of subword training."""
    texts = ["internationalization " * 5] * 8
    df = _docs(spark, texts)
    vocab = train_unigram(df, "text", vocab_size=30, min_count=1)
    from pyspark.sql import functions as F

    n_pieces = (
        unigram_encode(df, "text", vocab)
        .select(F.sum(F.size("pieces")).alias("n"))
        .collect()[0]["n"]
    )
    n_chars = sum(len(t.replace(" ", "")) + 5 for t in texts)  # + pretokens
    assert n_pieces < n_chars / 2


def test_unigram_null_text_and_validation(spark):
    df = spark.createDataFrame(
        [(1, "some words here"), (2, None)], "doc_id long, text string"
    )
    vocab = train_unigram(df, "text", vocab_size=30, min_count=1)
    enc = {r["doc_id"]: r["pieces"] for r in
           unigram_encode(df, "text", vocab).collect()}
    assert enc[2] is None and enc[1]
    with pytest.raises(ValueError, match="vocab_size"):
        train_unigram(df, "text", vocab_size=0)
    with pytest.raises(ValueError, match="below the corpus character"):
        train_unigram(df, "text", vocab_size=2, min_count=1)
    with pytest.raises(ValueError, match="not in DataFrame"):
        train_unigram(df, "missing", vocab_size=30)
    with pytest.raises(ValueError, match="max_words"):
        train_unigram(df, "text", vocab_size=30, min_count=1, max_words=1)


def test_unigram_encode_is_map_side(spark):
    df = spark.createDataFrame(
        [(1, "a b ab ab")], "doc_id long, text string"
    )
    vocab = train_unigram(df, "text", vocab_size=5, min_count=1)
    out = unigram_encode(df, "text", vocab)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p
    assert "ArrowEvalPython" in p or "Python" in p
