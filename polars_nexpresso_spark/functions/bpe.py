"""Byte-pair-encoding tokenizer training and encoding over a corpus.

The Spark-first decomposition of BPE training (Sennrich et al. 2016):

1. **Corpus scale**: ONE distributed aggregation reduces the corpus to
   its distinct-word frequency table (pretokenized with the same
   ``BPE_TOKEN_PATTERN`` the rest of ``text.py`` uses). At 100 TB this
   is the only pass that touches row data — a map-side-combine hash agg
   whose output is bounded by VOCABULARY size, not corpus size (Heaps'
   law: ~10^6-10^7 distinct words even for web-scale corpora; the
   ``min_count`` floor and ``max_words`` guard make the bound explicit
   and fail-fast rather than silent).
2. **Driver scale**: the merge loop runs on that word-frequency table
   (the same split the single-node reference trainers use — pair
   statistics are exactly computable from word counts, so training on
   the aggregate is NOT an approximation). Each iteration merges the
   most frequent adjacent symbol pair; ties break on the pair's
   lexicographic order so training is deterministic across runs,
   partitionings, and platforms.
3. **Encoding** is map-side again: the learned merge ranks broadcast in
   an Arrow-batched UDF closure that applies merges rank-first per
   word, with a per-batch word cache (Zipf: a handful of distinct
   words dominate any batch).

No SQL oracle by nature (iterative algorithm — the class the driver
records as rows-only), so the pytest evidence is the hand-computable
classic corpus, determinism, and the concat-roundtrip invariant.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_nexpresso_spark.functions.text import bpe_tokens

_END = "</w>"  # end-of-word sentinel: merges never cross word boundaries


def word_frequencies(
    df: DataFrame, text_col: str, *, min_count: int = 1
) -> DataFrame:
    """The corpus's distinct-(pre)word frequency table — the single
    corpus-scale pass of BPE training. One explode + one partial-agg
    shuffle keyed by word; everything downstream is vocabulary-sized."""
    return (
        df.select(F.explode(bpe_tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") >= min_count)
    )


def _pair_stats(words: list[tuple[tuple[str, ...], int]]) -> Counter:
    stats: Counter = Counter()
    for symbols, freq in words:
        for pair in zip(symbols, symbols[1:]):
            stats[pair] += freq
    return stats


def _merge_word(
    symbols: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    out: list[str] = []
    merged = pair[0] + pair[1]
    i = 0
    while i < len(symbols):
        if (
            i < len(symbols) - 1
            and symbols[i] == pair[0]
            and symbols[i + 1] == pair[1]
        ):
            out.append(merged)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def _merge_loop(
    words: list[tuple[tuple[str, ...], int]], num_merges: int
) -> list[tuple[int, str, str, str, int]]:
    """The driver-side merge loop with INCREMENTAL pair-count
    maintenance (the standard trainer trick): after each merge, only
    the words that actually contain the merged pair are rewritten and
    only their pair deltas touch the counters, instead of recomputing
    all pair statistics over the whole vocabulary per merge — that
    recompute was O(num_merges × Σ|word symbols|) and at the 1M-word
    cap with thousands of merges it is hours of driver CPU.

    Selection uses a lazy max-heap keyed ``(-freq, pair)``: the pop
    order IS the training order — highest frequency first, ties broken
    on the lexicographically smallest pair — so the merge table is
    byte-identical to the recompute-everything formulation (pinned by
    test_bpe.py's classic-corpus and equivalence tests). Stale heap
    entries (a pair whose count changed since it was pushed) are
    validated against the live counter on pop and re-pushed at their
    current count.

    Measured on a 50k-word Zipf vocabulary (the sf corpora's own
    vocabulary is a degenerate 61 words): naive ≈ 0.22 s/merge flat
    (11.2 s @ 50 merges, 44.3 s @ 200, ~37 min extrapolated @ 10k);
    incremental runs 50 merges in 1.0 s, 200 in 1.8 s, 10,000 in
    9.2 s — the speedup grows super-linearly with num_merges (11× →
    25× → ~240×) because per-merge cost decays to the touched-word
    set instead of staying vocabulary-sized.
    """
    stats = _pair_stats(words)
    pair_words: dict[tuple[str, str], set[int]] = {}
    for wi, (symbols, _f) in enumerate(words):
        for pair in zip(symbols, symbols[1:]):
            pair_words.setdefault(pair, set()).add(wi)
    import heapq

    heap = [(-c, p) for p, c in stats.items()]
    heapq.heapify(heap)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(num_merges):
        best: tuple[str, str] | None = None
        best_freq = 0
        while heap:
            neg_c, p = heap[0]
            c = stats.get(p, 0)
            if c == -neg_c and c > 0:
                best, best_freq = p, c
                break
            heapq.heappop(heap)  # stale: count changed since push
            if c > 0:
                heapq.heappush(heap, (-c, p))
        if best is None or best_freq < 2:
            break
        merges.append((rank, best[0], best[1], best[0] + best[1], best_freq))
        touched: set[tuple[str, str]] = set()
        for wi in list(pair_words.pop(best, ())):
            symbols, freq = words[wi]
            new_symbols = _merge_word(symbols, best)
            for pair in zip(symbols, symbols[1:]):
                left = stats.get(pair, 0) - freq
                if left > 0:
                    stats[pair] = left
                else:
                    stats.pop(pair, None)
                ws = pair_words.get(pair)
                if ws is not None:
                    ws.discard(wi)
                touched.add(pair)
            for pair in zip(new_symbols, new_symbols[1:]):
                stats[pair] = stats.get(pair, 0) + freq
                pair_words.setdefault(pair, set()).add(wi)
                touched.add(pair)
            words[wi] = (new_symbols, freq)
        for pair in touched:
            c = stats.get(pair, 0)
            if c > 0:
                heapq.heappush(heap, (-c, pair))
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str,
    *,
    num_merges: int,
    min_count: int = 2,
    max_words: int = 1_000_000,
) -> DataFrame:
    """Learn ``num_merges`` BPE merges from the corpus; returns the
    ordered merge table ``(rank, left, right, merged, pair_freq)`` —
    rank 0 first. Words start as character sequences with a ``</w>``
    end-of-word sentinel (merges stop at word boundaries, the classic
    formulation). Training may stop early (fewer rows than
    ``num_merges``) when no pair occurs twice.

    The corpus collapses to its word-frequency table first (see module
    docstring for why that is the scalable — and exact — split);
    ``max_words`` bounds the driver transfer explicitly.
    """
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1: {num_merges}")
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
    words: list[tuple[tuple[str, ...], int]] = [
        (tuple(w) + (_END,), int(f))
        for w, f in zip(pdf["word"], pdf["freq"])
    ]
    merges = _merge_loop(words, num_merges)
    spark = df.sparkSession
    return spark.createDataFrame(
        merges,
        "rank int, left string, right string, merged string, "
        "pair_freq bigint",
    )


def bpe_encode(
    df: DataFrame,
    text_col: str,
    merges: DataFrame,
    *,
    out_col: str = "bpe",
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge table: pretokenize
    with the shared regex, split each word to characters + ``</w>``,
    apply merges lowest-rank-first until none applies. Appends
    ``out_col`` as ``array<string>``.

    Map-side: the merge ranks ride the UDF closure (vocabulary-sized),
    each Arrow batch keeps a per-batch word→tokens cache (Zipf — most
    words repeat), and the concatenation of a word's output tokens
    equals the word + ``</w>`` by construction (the roundtrip
    invariant the tests pin). Stream-safe: no join, no shuffle, no
    state.
    """
    if text_col not in df.columns:
        raise ValueError(f"column {text_col!r} not in DataFrame")
    ranks: dict[tuple[str, str], int] = {
        (r["left"], r["right"]): int(r["rank"])
        for r in merges.select("rank", "left", "right").collect()
    }

    def encode_word(word: str, cache: dict) -> list[str]:
        hit = cache.get(word)
        if hit is not None:
            return hit
        symbols = tuple(word) + (_END,)
        while len(symbols) > 1:
            ranked = [
                (ranks[p], i)
                for i, p in enumerate(zip(symbols, symbols[1:]))
                if p in ranks
            ]
            if not ranked:
                break
            best_rank = min(ranked)[0]
            pair_idx = min(i for r, i in ranked if r == best_rank)
            pair = (symbols[pair_idx], symbols[pair_idx + 1])
            symbols = _merge_word(symbols, pair)
        out = list(symbols)
        cache[word] = out
        return out

    from pyspark.sql.functions import pandas_udf

    from polars_nexpresso_spark.functions.text import BPE_TOKEN_PATTERN

    pat = re.compile(BPE_TOKEN_PATTERN)

    @pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            toks: list[str] = []
            for w in pat.findall(t.lower()):
                toks.extend(encode_word(w, cache))
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, encode(F.col(text_col)))
