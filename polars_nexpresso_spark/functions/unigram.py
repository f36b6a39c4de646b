"""Unigram-LM subword tokenizer training and encoding over a corpus.

The SentencePiece unigram model (Kudo 2018) in the same Spark-first
decomposition as :mod:`.bpe` (whose module docstring argues the split):

1. **Corpus scale**: the ONE distributed pass is the distinct-word
   frequency aggregation (:func:`.bpe.word_frequencies` — shared with
   the BPE trainer, same ``BPE_TOKEN_PATTERN`` pretokenizer). Its
   output is bounded by vocabulary, not corpus, size; ``min_count`` /
   ``max_words`` keep the driver transfer explicit and fail-fast.
2. **Driver scale**: seed a large candidate vocabulary from substring
   counts, then alternate Viterbi hard-EM (re-estimate piece
   probabilities from the best segmentations, exactly computable from
   word counts — training on the aggregate is NOT an approximation)
   with pruning the weakest pieces until ``vocab_size`` remains.
   Single characters are never pruned, so every word stays segmentable.
   Hard-EM (Viterbi counts instead of forward-backward expectations) is
   the documented simplification: it is deterministic, and its fixed
   points are the same "maximize corpus likelihood under a unigram
   piece model" objective — adequate for the data-pipeline uses here
   (token budgeting, compression-ratio dials), not a bit-exact
   SentencePiece clone.
3. **Encoding** is map-side: the final piece log-probabilities ride an
   Arrow-batched UDF closure; each word segments by Viterbi with a
   per-batch word cache (Zipf: a handful of distinct words dominate any
   batch). Characters unseen at training time fall back to themselves
   as single-char pieces, preserving the concat-roundtrip invariant.

Determinism contract: all ties — seed selection, pruning, and the
Viterbi argmax — break on (count/score, then piece or position
lexicographically), so training reproduces across runs, partitionings,
and platforms. No SQL oracle by nature (iterative algorithm — the same
rows-only class as BPE and the sketches); the pytest evidence is the
roundtrip invariant, coverage, determinism, and compression behavior.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_nexpresso_spark.functions.bpe import word_frequencies

_NEG_INF = float("-inf")


def _viterbi(
    word: str,
    logp: dict[str, float],
    max_piece_len: int,
) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs.

    DP over end positions; candidate pieces are scanned longest-first,
    and updates use strict improvement, so score ties resolve to the
    segmentation whose final piece is LONGEST (then earlier choices
    recursively likewise) — a fixed, platform-independent rule.
    Characters absent from ``logp`` act as single-char pieces with a
    large penalty (encode-time robustness; during training every seen
    character is in the vocabulary).
    """
    n = len(word)
    best = [_NEG_INF] * (n + 1)
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    best[0] = 0.0
    unk_penalty = -1e3
    for end in range(1, n + 1):
        for length in range(min(max_piece_len, end), 0, -1):
            start = end - length
            if best[start] == _NEG_INF:
                continue
            piece = word[start:end]
            lp = logp.get(piece)
            if lp is None:
                if length > 1:
                    continue
                lp = unk_penalty
            score = best[start] + lp
            if score > best[end]:
                best[end] = score
                back[end] = (start, piece)
    out: list[str] = []
    pos = n
    while pos > 0:
        start, piece = back[pos]  # type: ignore[misc]
        out.append(piece)
        pos = start
    out.reverse()
    return out


def _estimate(
    words: list[tuple[str, int]],
    vocab: dict[str, float],
    max_piece_len: int,
) -> Counter:
    """Viterbi hard-EM E-step: frequency-weighted piece counts under the
    best segmentations."""
    counts: Counter = Counter()
    for word, freq in words:
        for piece in _viterbi(word, vocab, max_piece_len):
            counts[piece] += freq
    return counts


def _renormalize(counts: Counter, chars: set[str]) -> dict[str, float]:
    """M-step: piece log-probabilities from counts. Single characters
    that received no count keep a floor count of 1 so coverage never
    breaks (they must remain segmentable-to)."""
    full = Counter(counts)
    for ch in chars:
        if full[ch] == 0:
            full[ch] = 1
    total = sum(full.values())
    return {p: math.log(c / total) for p, c in full.items()}


def train_unigram(
    df: DataFrame,
    text_col: str,
    *,
    vocab_size: int,
    max_piece_len: int = 8,
    seed_multiplier: int = 4,
    em_iters: int = 2,
    shrink_factor: float = 0.75,
    min_count: int = 2,
    max_words: int = 1_000_000,
) -> DataFrame:
    """Learn a ``vocab_size``-piece unigram LM vocabulary from the
    corpus; returns the piece table ``(piece, logp, is_char)`` with
    log-probabilities from the final EM pass.

    The seed vocabulary is every single character plus the
    ``seed_multiplier * vocab_size`` most frequent multi-character
    substrings (length ≤ ``max_piece_len``) of the word-frequency
    table, counted with word frequencies. Each round runs ``em_iters``
    Viterbi-EM iterations, then prunes the lowest-count multi-char
    pieces down to ``max(vocab_size, round(size * shrink_factor))`` —
    the standard SentencePiece shrink schedule — until ``vocab_size``
    pieces remain.

    Driver-cost envelope (same dial as :func:`.bpe.train_bpe`): each EM
    iteration is O(Σ word-length × ``max_piece_len``) over the DISTINCT
    word table — at the ``max_words`` = 1M cap with ~10-char words and
    the default schedule (~8 shrink rounds × 2 iterations) that is
    ~10^9 simple dict/loop operations, i.e. minutes of driver CPU; the
    standard dial is ``min_count`` (Heaps' law: raising it shrinks the
    word table far faster than it moves the learned vocabulary). The
    substring-seeding pass is the same envelope, run once.
    """
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1: {vocab_size}")
    if max_piece_len < 2:
        raise ValueError(f"max_piece_len must be >= 2: {max_piece_len}")
    if not 0.1 <= shrink_factor < 1.0:
        raise ValueError(
            f"shrink_factor must be in [0.1, 1.0): {shrink_factor}"
        )
    if text_col not in df.columns:
        raise ValueError(f"column {text_col!r} not in DataFrame")
    wf = word_frequencies(df, text_col, min_count=min_count)
    pdf = wf.limit(max_words + 1).toPandas()
    if len(pdf) > max_words:
        raise ValueError(
            f"corpus has more than max_words={max_words} distinct words "
            f"above min_count={min_count}; raise min_count (the standard "
            "dial) or max_words"
        )
    words: list[tuple[str, int]] = sorted(
        (str(w), int(f)) for w, f in zip(pdf["word"], pdf["freq"])
    )

    chars: set[str] = set()
    substr_counts: Counter = Counter()
    for word, freq in words:
        chars.update(word)
        n = len(word)
        for i in range(n):
            for j in range(i + 2, min(i + max_piece_len, n) + 1):
                substr_counts[word[i:j]] += freq
    if not chars:
        raise ValueError("corpus has no tokenizable words")
    if vocab_size < len(chars):
        raise ValueError(
            f"vocab_size={vocab_size} is below the corpus character "
            f"count {len(chars)} — single characters are never pruned"
        )

    n_seed_multi = max(seed_multiplier * vocab_size - len(chars), 0)
    seeds = sorted(
        substr_counts.items(), key=lambda kv: (-kv[1], kv[0])
    )[:n_seed_multi]
    counts: Counter = Counter(dict(seeds))
    for word, freq in words:
        for ch in word:
            counts[ch] += freq
    vocab = _renormalize(counts, chars)

    while True:
        for _ in range(em_iters):
            counts = _estimate(words, vocab, max_piece_len)
            vocab = _renormalize(counts, chars)
        if len(vocab) <= vocab_size:
            break
        target = max(vocab_size, int(round(len(vocab) * shrink_factor)))
        multi = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )
        keep_multi = [p for p, _ in multi[: max(target - len(chars), 0)]]
        kept = set(keep_multi) | chars
        vocab = {p: lp for p, lp in vocab.items() if p in kept}
        # chars pruned from counts still need a slot
        for ch in chars:
            vocab.setdefault(ch, math.log(1.0 / max(sum(counts.values()), 1)))

    spark = df.sparkSession
    rows = sorted(
        (p, float(lp), len(p) == 1) for p, lp in vocab.items()
    )
    return spark.createDataFrame(
        rows, "piece string, logp double, is_char boolean"
    )


def unigram_encode(
    df: DataFrame,
    text_col: str,
    vocab: DataFrame,
    *,
    out_col: str = "pieces",
    max_piece_len: int = 8,
) -> DataFrame:
    """Tokenize ``text_col`` with a learned unigram vocabulary:
    pretokenize with the shared regex, Viterbi-segment each word under
    the piece log-probabilities. Appends ``out_col`` as
    ``array<string>``; NULL text stays NULL.

    Map-side: the piece table rides the UDF closure (vocabulary-sized),
    each Arrow batch keeps a per-batch word→pieces cache, and the
    concatenation of a word's pieces equals the word by construction
    (unseen characters fall back to single-char pieces). Stream-safe:
    no join, no shuffle, no state.
    """
    if text_col not in df.columns:
        raise ValueError(f"column {text_col!r} not in DataFrame")
    logp: dict[str, float] = {
        r["piece"]: float(r["logp"])
        for r in vocab.select("piece", "logp").collect()
    }
    if not logp:
        raise ValueError("empty vocabulary")

    from pyspark.sql.functions import pandas_udf

    from polars_nexpresso_spark.functions.text import BPE_TOKEN_PATTERN

    pat = re.compile(BPE_TOKEN_PATTERN)

    @pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            pieces: list[str] = []
            for w in pat.findall(t.lower()):
                hit = cache.get(w)
                if hit is None:
                    hit = _viterbi(w, logp, max_piece_len)
                    cache[w] = hit
                pieces.extend(hit)
            out.append(pieces)
        return pd.Series(out)

    return df.withColumn(out_col, encode(F.col(text_col)))
