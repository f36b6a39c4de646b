"""Text-analysis operators for large-scale training-data pipelines.

Everything here is a pure Spark Column expression (JVM-side, whole-stage
codegen, no Python in the hot path), designed so the identical computation is
expressible in ANSI-ish SQL for the DuckDB oracle:

- tokenization + token counting (whitespace),
- quality scoring (length / token-length / stopword / uniqueness ratios),
- marker-based language identification (occurrence-count scoring),
- document fingerprinting (md5 of normalized text) and a 60-bit
  md5-derived token hash shared bit-for-bit with DuckDB
  (``CAST('0x'||substr(md5(t),1,15) AS BIGINT)``).

At 100 TB these are embarrassingly parallel map-side expressions: no
shuffle, no state; they pushdown-project only the ``text`` column from
parquet scans.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker vocabularies for the n-gram/stopword language-ID heuristic. Scores
# are occurrence counts of space-padded markers — computable identically in
# any SQL engine via length arithmetic.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "fast", "slow", "small", "big"],
    "es": ["el", "la", "de", "que", "y", "una"],
    "fr": ["le", "la", "et", "les", "une", "des"],
    "de": ["der", "die", "und", "das", "ein", "nicht"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}

STOPWORDS = [
    "the", "a", "an", "of", "and", "or", "in", "on", "to", "is", "it",
]


def let_bound(value: Column, body) -> Column:
    """Evaluate ``value`` ONCE and pass it to ``body`` as a bound lambda
    variable — a let-binding for Column expressions.

    Spark higher-order-function lambdas re-evaluate every non-argument
    expression per element, so a helper that references an expensive
    expression (``tokens(col)``, a cast embedding, a sorted array)
    inside a ``F.transform``/``F.filter`` lambda silently goes
    O(len²) per row — the round-10 char_entropy rake, tripwired by
    :func:`polars_nexpresso_spark.plans.audit.hof_reeval_risks`.
    DataFrame-level code stages such expressions as real columns in
    their own projection; Column-in/Column-out helpers can't, so this
    wraps ``value`` as the single element of an array literal (HOF
    *arguments* are evaluated once), binds it to the lambda variable,
    and unwraps the single result. Works for any value type, including
    arrays-of-arrays (``F.get`` unwraps by index, not by flattening).

    CAVEAT — JVM-only consumers: when ``body`` itself contains a lambda
    that references the outer variable (the usual reason to let-bind),
    the result is a NESTED-lambda expression, and Spark's
    ExtractPythonUDFs cannot extract a Python UDF whose argument
    contains one (the UDF's ``references`` leak the outer lambda
    variable; the un-extracted UDF then dies at runtime with
    INTERNAL_ERROR "Cannot evaluate expression"). Never feed a
    let_bound expression into a pandas UDF — stage it as a real column
    in a DataFrame projection instead (see word_ngrams_all for the
    extraction-safe zip alternative when no DataFrame is in reach).
    """
    return F.get(F.transform(F.array(value), body), 0)


def normalize_text(col: Column) -> Column:
    """Lowercase, collapse whitespace runs to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def tokens(col: Column) -> Column:
    """Whitespace tokenization of normalized text (empty text → empty array)."""
    norm = normalize_text(col)
    return F.when(F.length(norm) == 0, F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def char_count(col: Column) -> Column:
    return F.length(col)


def avg_token_length(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return F.try_divide(total, F.size(toks))


def unique_token_ratio(col: Column) -> Column:
    toks = tokens(col)
    return F.try_divide(F.size(F.array_distinct(toks)), F.size(toks))


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    toks = tokens(col)
    sw = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS)])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.try_divide(hits, F.size(toks))


def digit_ratio(col: Column) -> Column:
    stripped = F.regexp_replace(col, r"[0-9]", "")
    return F.try_divide(F.length(col) - F.length(stripped), F.length(col))


def pad_text(col: Column) -> Column:
    """Space-pad normalized text for marker counting. Materialize this ONCE
    in its own projection before scoring: every marker score references it,
    and re-inlining the regex normalization per marker (~30×) is the
    dominant cost of language-ID."""
    return F.concat(F.lit(" "), normalize_text(col), F.lit(" "))


def marker_occurrences(col: Column, marker: str, *, pre_padded: bool = False) -> Column:
    """Count occurrences of a space-padded marker word.

    ``(len(padded) - len(replace(padded, ' m '))) / len(' m ')`` — identical
    arithmetic in Spark and DuckDB, so the oracle matches bit-for-bit.
    """
    padded = col if pre_padded else pad_text(col)
    needle = f" {marker} "
    # Literal (non-regex) replace: same left-to-right non-overlapping
    # semantics as SQL replace(), so the oracle arithmetic matches exactly.
    stripped = F.replace(padded, F.lit(needle), F.lit(""))
    return ((F.length(padded) - F.length(stripped)) / len(needle)).cast("long")


def language_scores(
    col: Column,
    profiles: dict[str, list[str]] | None = None,
    *,
    pre_padded: bool = False,
) -> dict[str, Column]:
    """Per-language marker-occurrence totals."""
    out: dict[str, Column] = {}
    for lang, markers in (profiles or LANG_PROFILES).items():
        score = reduce(
            lambda a, b: a + b,
            [marker_occurrences(col, m, pre_padded=pre_padded) for m in markers],
        )
        out[lang] = score
    return out


def language_id(
    col: Column,
    profiles: dict[str, list[str]] | None = None,
    *,
    pre_padded: bool = False,
) -> Column:
    """Argmax language by marker score; alphabetical tie-break; 'und' if all 0."""
    scores = language_scores(col, profiles, pre_padded=pre_padded)
    best = None
    for lang in sorted(scores):  # alphabetical order makes ties deterministic
        cond = reduce(
            lambda a, b: a & b,
            [
                (scores[lang] >= scores[other]) if other > lang else (scores[lang] > scores[other])
                for other in sorted(scores)
                if other != lang
            ],
        )
        clause = F.when(cond & (scores[lang] > 0), F.lit(lang))
        best = clause if best is None else best.when(cond & (scores[lang] > 0), F.lit(lang))
    return best.otherwise(F.lit("und"))


def doc_fingerprint(col: Column) -> Column:
    """Content fingerprint: md5 of normalized text (same as SQL
    ``md5(<normalization>)`` — exact-dedup key)."""
    return F.md5(normalize_text(col))


def robust_fingerprint(col: Column, *, fold_unicode: bool = False) -> Column:
    """Canonicalized content fingerprint for near-boilerplate EXACT
    dedup: lowercase → digit runs collapsed to a single ``0`` → ASCII
    punctuation to spaces → whitespace runs collapsed → trim → md5.
    Catches the standard crawl pathology :func:`doc_fingerprint`
    misses — pages identical up to timestamps, view counters, session
    ids, or prices ("posted 2024-01-02, 1,372 views" vs "posted
    2026-08-16, 9 views") — while staying one map-side expression and
    one groupBy shuffle, the same scale shape as exact dedup. Every
    regex class is ASCII-only, so Java regex (Spark) and RE2 (DuckDB)
    agree byte-for-byte and the md5 keys are engine-portable.

    ``fold_unicode=True`` additionally folds the FIXED literal set of
    common Unicode punctuation/space characters
    (:data:`UNICODE_PUNCT_CLASS`) to spaces first, merging the smart-
    quote/em-dash/NBSP re-render of a page with its ASCII original.
    The same engine-portability contract holds BECAUSE the class is an
    explicit character list, never a ``\\p{P}``-style property class —
    property classes are Unicode-version-dependent and Java vs RE2
    may disagree on them, while a literal list compares byte-for-byte
    in both engines."""
    return F.md5(robust_canonical_text(col, fold_unicode=fold_unicode))


# The EXPLICIT Unicode punctuation/space characters fold_unicode maps
# to spaces — literal chars + literal ranges only (the engine-portable
# contract; see robust_fingerprint). Covers: NBSP, guillemets, middle
# dot, the U+2000 space block + ZWSP, hyphen/dash block, smart
# single/double quotes, bullet, ellipsis, per-mille, prime/double
# prime, single guillemets, minus sign, narrow NBSP, ideographic
# space, CJK angle brackets and comma/full stop.
UNICODE_PUNCT_CLASS = (
    "\u00a0\u00ab\u00b7\u00bb"  # NBSP, guillemets, middle dot
    "\u2000-\u200b"  # en-quad..hair-space + ZWSP (range)
    "\u2010-\u2015"  # hyphen..horizontal-bar dash block (range)
    "\u2018-\u201e"  # smart single/double quotes (range)
    "\u2022\u2026\u2030\u2032\u2033"  # bullet, ellipsis, permille, primes
    "\u2039\u203a\u2212\u202f"  # single guillemets, minus, narrow NBSP
    "\u3000\u300a\u300b\u3001\u3002"  # ideographic space, CJK brackets/punct
)


def robust_canonical_text(col: Column, *, fold_unicode: bool = False) -> Column:
    """The canonical string :func:`robust_fingerprint` hashes —
    exposed so the reference-dedup family can key on the same
    canonicalization (``canon="robust"``)."""
    canon = F.lower(col)
    if fold_unicode:
        canon = F.regexp_replace(canon, f"[{UNICODE_PUNCT_CLASS}]", " ")
    canon = F.regexp_replace(canon, "[0-9]+", "0")
    canon = F.regexp_replace(canon, "[!-/:-@\\[-`{-~]", " ")
    return F.trim(F.regexp_replace(canon, r"\s+", " "))


def token_hash60(col: Column) -> Column:
    """60-bit integer hash of a token derived from md5.

    Shared with DuckDB: ``CAST('0x' || substr(md5(t), 1, 15) AS BIGINT)``.
    15 hex chars = 60 bits, always within signed-long range.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# GPT-2-family pretokenizer shape (ASCII, lowercased): contraction suffixes,
# space-prefixed letter runs, digit runs, punctuation runs. Simple enough that
# Java regex (Spark) and RE2 (DuckDB) agree exactly.
BPE_TOKEN_PATTERN = r"'[a-z]+| ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9]+"


def bpe_tokens(col: Column) -> Column:
    """BPE-ish regex pretokenization — the subword-boundary token stream a
    byte-pair encoder would merge from. Map-side only."""
    return F.regexp_extract_all(F.lower(col), F.lit(BPE_TOKEN_PATTERN), F.lit(0))


def bpe_token_count(col: Column) -> Column:
    return F.size(bpe_tokens(col))


_FP_MOD = 2147483647  # 2^31 - 1 (Mersenne): keeps acc*base + x within int64
_FP_BASE = 131


def rolling_fingerprint(col: Column) -> Column:
    """Polynomial rolling-hash document fingerprint over whitespace tokens.

    ``h = fold(tokens, 0, (acc, t) -> (acc*131 + hash60(t) mod M) mod M)``
    with M = 2^31-1 — order-sensitive (unlike the md5 content fingerprint)
    and reproducible in DuckDB via ``list_reduce(list_prepend(0, ...))``.
    """
    hashes = F.transform(tokens(col), lambda t: token_hash60(t) % _FP_MOD)
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * _FP_BASE + x) % _FP_MOD,
    )


def simhash60(col: Column, bits: int = 60) -> Column:
    """SimHash over whitespace tokens using the shared 60-bit token hash.

    Bit *i* of the result is 1 when the majority of token hashes have bit
    *i* set. Pure array expressions (one pass per bit) — no shuffle; at
    scale this is a map-only projection.
    """
    toks = F.array_distinct(tokens(col))
    hashes = F.transform(toks, lambda t: token_hash60(t))
    n = F.size(hashes)
    terms = []
    for i in range(bits):
        ones = F.size(
            F.filter(hashes, _bit_set_fn(i))
        )
        terms.append(F.when(ones * 2 >= n, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long")))
    return reduce(lambda a, b: a + b, terms)


def _bit_set_fn(i: int):
    return lambda h: F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1


def simhash_table(
    df, text_col: str, id_col: str, bits: int = 60
):
    """Per-document SimHash as a DataFrame: ``(id_col, simhash)``.

    Same result as ``simhash60`` (majority vote over distinct token hashes,
    ties set the bit), restructured for throughput: explode distinct tokens
    and aggregate 60 bit-count sums per document in one hash aggregation.
    The per-bit sums are whole-stage-codegen'd JVM arithmetic, where
    ``simhash60``'s 60 ``F.filter`` passes run as interpreted array lambdas
    (the same trap as the MinHash signature inlining — see perf notes in
    dedup.py). Map-side partial aggregation collapses each document's
    tokens before the shuffle, so the exchange carries one row per doc.

    Empty/absent token lists yield the all-ones hash (0 ones * 2 >= 0),
    matching ``simhash60`` on empty text.
    """
    hashes = df.select(
        F.col(id_col).alias(id_col),
        F.explode_outer(F.array_distinct(tokens(F.col(text_col)))).alias("__tok"),
    ).select(id_col, token_hash60(F.col("__tok")).alias("__h"))
    # r14 (guide §3.3 — the r13 C4/C5 pattern): the 60 per-bit aggregates
    # and the 60 majority-vote terms parse as SQL strings instead of
    # ~400 py4j Column round trips — the same expression trees reach
    # Catalyst (shiftright/&/CASE/coalesce map 1:1, literals keep their
    # int/bigint types), but building them cost 1.6-2.2 s of driver
    # Python per call at any scale. Measured construct: 2.2 → <0.2 s.
    aggs = [F.expr("count(__h) AS __n")] + [
        F.expr(f"sum(shiftright(__h, {i}) & 1) AS __b{i}")
        for i in range(bits)
    ]
    grouped = hashes.groupBy(id_col).agg(*aggs)
    vote_sql = " + ".join(
        f"(CASE WHEN (coalesce(__b{i}, 0) * 2) >= __n "
        f"THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i in range(bits)
    )
    return grouped.select(
        F.col(id_col), F.expr(vote_sql).alias("simhash")
    )


def word_ngrams(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (space-joined) of the normalized text.

    Documents shorter than *n* tokens yield their full token sequence as a
    single shingle so they still participate in similarity joins.
    """
    return F.array_distinct(word_ngrams_all(col, n))


def word_ngrams_all(col: Column, n: int = 3) -> Column:
    """Word n-grams WITH duplicates (the multiset) — what repetition
    statistics need; ``word_ngrams`` dedups this for similarity joins.

    Built by zipping ``n`` SHIFTED slices of the token array —
    ``zip_with(toks[1:N], toks[2:N+1], concat) ...`` — because every
    slice is a HOF *argument* (evaluated once) and every lambda touches
    only its own variables. The two rejected shapes: referencing
    ``tokens(col)`` inside a window lambda re-runs normalize+split per
    window — O(len²) per row (the hof_reeval_risks rake) — and the
    :func:`let_bound` form, whose nested lambda (inner body referencing
    the outer variable) breaks Spark's ExtractPythonUDFs whenever the
    expression collapses into a Python-UDF argument (the UDF's
    ``references`` leak the outer lambda variable, the Filter keeps the
    raw PythonUDF, and the task dies with INTERNAL_ERROR "Cannot
    evaluate expression" — decontaminate_bloom reproduced this). This
    helper feeds both JVM-only and pandas-UDF consumers, so it must be
    extraction-safe. Cost: tokens re-evaluates once per shift, O(n·len)
    per row — constant-factor, not quadratic. DataFrame consumers that
    can stage a real token column should call
    :func:`word_ngrams_from_tokens` on it instead (r11 advice): a
    staged column reference is free per shift, so the n+3
    re-tokenizations collapse to one."""
    return word_ngrams_from_tokens(tokens(col), n)


def word_ngrams_from_tokens(toks: Column, n: int = 3) -> Column:
    """``word_ngrams_all`` over an already-tokenized array column.

    Same shifted-slice zip construction and same short-document /
    NULL contracts; ``toks`` is referenced n+3 times, so pass a staged
    COLUMN (cheap per reference), not an inline ``tokens(...)``
    expression — that is what :func:`word_ngrams_all` is for."""
    n_windows = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    grams = F.slice(toks, 1, n_windows)
    for k in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, k + 1, n_windows),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    # Shorter-than-n documents yield their full token sequence as one
    # shingle (zip_with would NULL-pad ragged slices); NULL text keeps
    # the [NULL] contract via the otherwise branch.
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array(F.array_join(toks, " "))
    )


def repetition_table(
    df, text_col: str, id_col: str, *, n: int = 2
):
    """Per-document n-gram repetition statistics (the Gopher-style quality
    signal: heavily repeated n-grams mark boilerplate/spam/looped text).

    Returns ``(id, top_count, total_ngrams, repetition_ratio)`` where
    ``repetition_ratio`` = occurrences of the most frequent n-gram divided
    by total n-gram occurrences. Explode + two key-local aggregations with
    map-side combine; the shuffle carries one row per (doc, distinct gram).
    """
    # Stage tokens ONCE as a real column: word_ngrams_all inline would
    # re-run normalize+split n+3 times per row (r11 advice). Catalyst's
    # CollapseProject keeps the staged alias because it is non-cheap
    # and multiply-referenced — verified in test_text.py's plan pin.
    exploded = df.select(
        F.col(id_col).alias("__id"),
        tokens(F.col(text_col)).alias("__toks"),
    ).select(
        "__id",
        F.explode(
            word_ngrams_from_tokens(F.col("__toks"), n)
        ).alias("__gram"),
    )
    per_gram = exploded.groupBy("__id", "__gram").agg(
        F.count("*").alias("__c")
    )
    return (
        per_gram.groupBy("__id")
        .agg(
            F.max("__c").alias("top_count"),
            F.sum("__c").alias("total_ngrams"),
        )
        .select(
            F.col("__id").alias(id_col),
            "top_count",
            "total_ngrams",
            F.round(F.col("top_count") / F.col("total_ngrams"), 6).alias(
                "repetition_ratio"
            ),
        )
    )


def vocab_topk(df, text_col: str, *, k: int = 100):
    """Corpus-wide token histogram: the ``k`` most frequent tokens with a
    deterministic (count desc, token asc) tie-break.

    Explode + one hash aggregation with map-side partial combine — the
    shuffle carries one row per (partition, distinct token), i.e. ~vocab
    size, not corpus size. The final top-k over vocab-sized counts is a
    TakeOrdered (no global sort materialization); ranks are numbered on the
    ≤k collected survivors only.

    Returns ``(token, count, rank)``.
    """
    from pyspark.sql.window import Window

    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("count"))
    )
    top = counts.orderBy(F.col("count").desc(), F.col("token").asc()).limit(k)
    # ≤ k rows survive; the unpartitioned window is bounded by construction.
    w = Window.orderBy(F.col("count").desc(), F.col("token").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("bigint"))


def tfidf_keywords(df, text_col: str, id_col: str, *, top_n: int = 3):
    """Per-document top-``top_n`` keywords by smoothed TF-IDF
    (``tf · (ln((N+1)/(df+1)) + 1)``, rounded to 6 decimals — the rounding
    is part of the contract so ranking is engine-reproducible).

    Shape at scale: explode → (doc, token) hash agg (map-side combine) →
    token-keyed join against the document-frequency agg → per-doc window
    top-n. Two shuffles over (doc, distinct-token) pairs plus one over the
    vocab — never over raw token occurrences. The corpus size ``N`` is a
    1-row aggregate broadcast into the scoring projection.

    Returns ``(id, token, tfidf, rank)``.
    """
    from pyspark.sql.window import Window

    pairs = (
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(tokens(F.col(text_col))).alias("token"),
        )
        .groupBy("__id", "token")
        .agg(F.count("*").alias("__tf"))
    )
    # pairs feeds both the document-frequency agg and the scoring join, so
    # its explode+agg subtree evaluates twice — measured at sf0.1, caching
    # it is a net LOSS (1.64 s vs 1.45 s: materializing the pair table
    # costs more than re-running the cheap token explode), unlike the
    # minhash/simhash blocking tables where the recomputed pipeline is the
    # expensive half. Left uncached on evidence.
    dfreq = pairs.groupBy("token").agg(F.count("*").alias("__df"))
    n_docs = df.select(F.count("*").alias("__n"))
    scored = (
        pairs.join(dfreq, on="token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "__id",
            "token",
            F.round(
                F.col("__tf")
                * (F.log((F.col("__n") + 1.0) / (F.col("__df") + 1.0)) + 1.0),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("__id").orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= top_n)
        .select(F.col("__id").alias(id_col), "token", "tfidf", "rank")
    )


def group_percentiles(
    df,
    value_col,
    group_col: str,
    *,
    ps: tuple = (0.5, 0.9, 0.99),
    approx: bool = False,
    accuracy: int = 10000,
):
    """Per-group percentiles of a numeric column — the corpus
    quality-monitoring shape (e.g. token-count distribution per language).

    ``approx=False`` (default) uses Spark's exact ``percentile`` (linear
    interpolation, matches SQL ``quantile_cont``) — a sort-based
    aggregation, fine up to ~10⁸ rows per group. ``approx=True`` switches
    to ``approx_percentile`` (one-pass mergeable sketch, the 100 TB path);
    results then carry sketch error and are NOT oracle-exact by design.

    Returns ``(group, p_<XX> ...)`` with values rounded to 4 decimals.
    """
    fn = (
        (lambda c, p: F.approx_percentile(c, F.lit(p), F.lit(accuracy)))
        if approx
        else (lambda c, p: F.percentile(c, F.lit(p)))
    )
    aggs = [
        F.round(
            fn(F.col(value_col).cast("double"), p).cast("double"), 4
        ).alias(f"p_{str(p).replace('0.', '').ljust(2, '0')}")
        for p in ps
    ]
    return df.groupBy(F.col(group_col).alias("group")).agg(*aggs)


def ngram_lm_score(
    df,
    text_col: str,
    id_col: str,
    *,
    n: int = 2,
    k: float = 0.5,
    reference=None,
):
    """CCNet-style n-gram LM quality score: per-document average negative
    log-probability under an add-k-smoothed n-gram model.

    The model trains on ``reference`` (default: the corpus itself — the
    self-scoring form; pass a clean reference corpus for CCNet's
    perplexity-bucket filtering). For every n-gram occurrence the
    conditional probability is ``(c(gram) + k) / (c(prefix) + k*V)``
    where ``c(prefix)`` sums counts of grams sharing the first ``n-1``
    tokens and ``V`` is the reference's distinct-token vocabulary size;
    the score is the mean of ``-ln P`` over the document's gram multiset.
    Low score = predictable/fluent under the reference distribution;
    high = rare or garbled text (or boilerplate the reference lacks).

    Scale shape: two count aggregations with map-side combine (gram
    counts, prefix counts — one row per distinct gram / prefix), a
    vocabulary scalar attached via broadcast cross join (same pattern as
    ``tfidf_keywords``'s document count), and the per-doc join runs on
    64-bit xxhash64 gram keys so the shuffles never carry gram STRINGS —
    exact modulo 64-bit collisions, the same contract as the dedup
    module's shingle joins. Everything is expression-level (no Python).

    Returns ``(id, n_grams, avg_neg_logp)`` with one row per document
    that produced at least one n-gram.
    """
    ref = df if reference is None else reference
    prefix_of = lambda gram: F.substring_index(gram, " ", n - 1)  # noqa: E731

    # NULL text yields a [null] gram (size(null) is -1 pre-ANSI, so the
    # sequence window still emits one slot) and empty text yields [""];
    # both are noise, not grams — filter them on every explode so
    # degenerate docs drop out instead of scoring a phantom gram.
    def _real_grams(frame):
        # Token column staged once per row (see repetition_table note).
        return (
            frame.withColumn("__toks", tokens(F.col(text_col)))
            .select(
                *frame.columns,
                F.explode(
                    word_ngrams_from_tokens(F.col("__toks"), n)
                ).alias("__gram"),
            )
            .filter(F.col("__gram").isNotNull() & (F.length("__gram") > 0))
        )

    # ONE explode over the reference: count by gram STRING first, then
    # derive both hash-keyed tables from the distinct-gram counts — the
    # prefix aggregation re-sums |distinct grams| rows instead of
    # re-exploding and re-shuffling every gram OCCURRENCE (measured at
    # sf0.1: 3.6 s → ~2.5 s for the self-scoring query).
    gram_str_counts = (
        _real_grams(ref.select(F.col(text_col)))
        .groupBy("__gram")
        .agg(F.count("*").alias("__c2"))
    )
    # Re-aggregate by hash (cheap: one row per DISTINCT gram) so the join
    # key stays unique even under a 64-bit gram-hash collision, exactly as
    # the previous groupBy-hash-of-occurrences form guaranteed.
    gram_counts = gram_str_counts.groupBy(
        F.xxhash64("__gram").alias("__gh")
    ).agg(F.sum("__c2").alias("__c2"))
    prefix_counts = gram_str_counts.groupBy(
        F.xxhash64(prefix_of(F.col("__gram"))).alias("__ph")
    ).agg(F.sum("__c2").alias("__c1"))
    vocab = ref.select(
        F.explode(tokens(F.col(text_col))).alias("__t")
    ).agg(F.count_distinct("__t").alias("__V"))

    doc_grams = _real_grams(
        df.select(F.col(id_col).alias("__id"), F.col(text_col))
    ).select(
        "__id",
        F.xxhash64("__gram").alias("__gh"),
        F.xxhash64(prefix_of(F.col("__gram"))).alias("__ph"),
    )
    scored = (
        doc_grams.join(gram_counts, on="__gh", how="left")
        .join(prefix_counts, on="__ph", how="left")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "__nlp",
            -F.log(
                (F.coalesce(F.col("__c2"), F.lit(0)) + F.lit(float(k)))
                / (
                    F.coalesce(F.col("__c1"), F.lit(0))
                    + F.lit(float(k)) * F.col("__V")
                )
            ),
        )
    )
    return (
        scored.groupBy("__id")
        .agg(
            F.count("*").alias("n_grams"),
            F.round(F.avg("__nlp"), 6).alias("avg_neg_logp"),
        )
        .select(F.col("__id").alias(id_col), "n_grams", "avg_neg_logp")
    )


def ngram_lm_score_stream(
    df,
    reference,
    text_col: str,
    *,
    n: int = 2,
    k: float = 0.5,
    max_reference_grams: int = 5_000_000,
):
    """Stream-safe :func:`ngram_lm_score`: STATELESS, map-side only.

    The batch scorer joins per-doc grams against corpus-wide count
    tables — joins and per-doc aggregations a stream would need
    watermarked state for. This variant collects the REFERENCE model
    (gram counts, prefix counts, vocabulary size — bounded by
    ``max_reference_grams``) into sorted numpy dictionaries once, and
    scores each incoming document with a vectorized binary-search probe
    per Arrow batch: no join, no shuffle, no state — identical scores to
    ``ngram_lm_score(df, ..., reference=reference)`` and works the same
    on a batch DataFrame or an unbounded ``readStream`` (the
    quality-gate shape of a production ingest pipeline, alongside
    :func:`~polars_nexpresso_spark.functions.dedup.decontaminate_stream`).

    ``reference`` must be a batch DataFrame (it is collected). Documents
    with NULL/empty text get a NULL score. Returns the input schema plus
    ``(n_grams, avg_neg_logp)``.
    """
    import numpy as np

    from polars_nexpresso_spark.functions._vectorized import pandas_lm_score

    prefix_of = lambda gram: F.substring_index(gram, " ", n - 1)  # noqa: E731

    # Same degenerate-text rule as the batch scorer: NULL text yields a
    # [null] gram and empty text [""] — neither is a real gram.
    ref_grams = (
        reference.select(tokens(F.col(text_col)).alias("__toks"))
        .select(
            F.explode(
                word_ngrams_from_tokens(F.col("__toks"), n)
            ).alias("__gram")
        )
        .filter(F.col("__gram").isNotNull() & (F.length("__gram") > 0))
    )
    # Same one-explode shape as the batch scorer: count by gram string,
    # then derive both hash-keyed dictionaries from the distinct-gram
    # counts (the prefix sum runs over distinct grams, not occurrences).
    gram_str_counts = ref_grams.groupBy("__gram").agg(
        F.count("*").alias("__c")
    )
    # ONE reference-scan job builds both dictionaries: ship the distinct-
    # gram counts with their Spark-computed gram AND prefix hashes via
    # Arrow (toPandas — no Row materialization), then fold the prefix
    # aggregation driver-side over the O(distinct grams) frame. The
    # previous two-job + row-collect form paid a full scan per
    # dictionary; model build measured 1.9 s → ~0.8 s at sf0.1.
    gram_pdf = gram_str_counts.select(
        F.xxhash64("__gram").alias("__gh"),
        F.xxhash64(prefix_of(F.col("__gram"))).alias("__ph"),
        "__c",
    ).toPandas()
    if len(gram_pdf) > max_reference_grams:
        raise ValueError(
            f"reference has {len(gram_pdf)} distinct {n}-grams > "
            f"max_reference_grams={max_reference_grams}; use the batch "
            "ngram_lm_score join path for references this large"
        )
    vocab_size = (
        reference.select(F.explode(tokens(F.col(text_col))).alias("__t"))
        .agg(F.count_distinct("__t").alias("__V"))
        .collect()[0]["__V"]
    )

    def _sorted_sum(keys_np, vals_np):
        # Sum counts per key (hash-collision-safe, mirroring the batch
        # path's re-aggregation), return (sorted keys, aligned sums).
        order = np.argsort(keys_np)
        keys_np, vals_np = keys_np[order], vals_np[order]
        uniq, starts = np.unique(keys_np, return_index=True)
        return uniq, np.add.reduceat(vals_np, starts)

    counts = gram_pdf["__c"].to_numpy(dtype=np.float64)
    gh, gc = _sorted_sum(gram_pdf["__gh"].to_numpy(dtype=np.int64), counts)
    ph, pc = _sorted_sum(gram_pdf["__ph"].to_numpy(dtype=np.int64), counts)

    score = pandas_lm_score(gh, gc, ph, pc, vocab_size, k)
    # Tokens and the filtered gram array stage ONCE as real columns
    # (the repetition_table staging pattern, r11 advice): the previous
    # Column-only form rebuilt word_ngrams_all inside BOTH hash
    # projections — ~2(n+3) tokenizations per row in the stream-scorer
    # hot path. Both aliases are non-cheap and multiply-referenced, so
    # CollapseProject keeps them; pure stateless projections, still
    # readStream-safe.
    valid = F.size(F.col("__toks")) > 0
    g_hashes = F.when(
        valid, F.transform(F.col("__grams"), lambda g: F.xxhash64(g))
    )
    p_hashes = F.when(
        valid,
        F.transform(F.col("__grams"), lambda g: F.xxhash64(prefix_of(g))),
    )
    return (
        df.withColumn("__toks", tokens(F.col(text_col)))
        .withColumn(
            "__grams",
            F.filter(
                word_ngrams_from_tokens(F.col("__toks"), n),
                lambda g: g.isNotNull() & (F.length(g) > 0),
            ),
        )
        .withColumn("__g", g_hashes)
        .withColumn("__p", p_hashes)
        .withColumn(
            "n_grams",
            F.when(valid, F.size("__g")).otherwise(F.lit(0)).cast("bigint"),
        )
        .withColumn("avg_neg_logp", score(F.col("__g"), F.col("__p")))
        .drop("__g", "__p", "__toks", "__grams")
    )


# --- Composite quality gate -------------------------------------------------

# (rule name, builder: tokens-expr -> failing-condition Column). NULL
# conditions (ratio rules on empty documents) read as "not failing" — the
# empty doc already fails too_few_tokens, and NULL semantics are identical
# in Spark and DuckDB so the oracle agrees rule-for-rule.
QUALITY_RULES: list[str] = [
    "too_few_tokens",
    "too_many_tokens",
    "bad_avg_token_len",
    "low_stopword_ratio",
    "low_unique_ratio",
    "high_digit_ratio",
]


def quality_filter(
    df,
    text_col: str,
    id_col: str,
    *,
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_avg_token_len: float = 2.0,
    max_avg_token_len: float = 12.0,
    min_stopword_ratio: float = 0.03,
    min_unique_ratio: float = 0.2,
    max_digit_ratio: float = 0.3,
) -> "DataFrame":
    """C4/Gopher-style composite quality gate with per-rule provenance.

    Returns ``(id, n_tokens, keep, reasons)`` where ``reasons`` is the
    comma-joined list of failed rule names (in :data:`QUALITY_RULES`
    order, empty string when the document passes) and ``keep`` is true
    iff no rule failed. Keeping the failure provenance instead of just a
    boolean is what makes the gate tunable at corpus scale: one
    aggregation over ``reasons`` gives the per-rule kill counts that
    C4/Gopher-style threshold tuning iterates on.

    Pure map-side column expressions over one shared token-array
    projection — no shuffle, no Python, streaming-safe; the thresholds
    default to the published C4/Gopher neighborhoods scaled to this
    corpus's synthetic text.
    """
    text = F.col(text_col)
    toks = tokens(text)
    n = F.size(toks)
    avg_len = F.try_divide(
        F.aggregate(
            F.transform(toks, lambda t: F.length(t)),
            F.lit(0),
            lambda acc, x: acc + x,
        ),
        n,
    )
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    sw_ratio = F.try_divide(
        F.size(F.filter(toks, lambda t: F.array_contains(sw, t))), n
    )
    uniq_ratio = F.try_divide(F.size(F.array_distinct(toks)), n)
    digits = F.try_divide(
        F.length(text) - F.length(F.regexp_replace(text, "[0-9]", "")),
        F.length(text),
    )
    conds = {
        "too_few_tokens": n < min_tokens,
        "too_many_tokens": n > max_tokens,
        "bad_avg_token_len": (avg_len < min_avg_token_len)
        | (avg_len > max_avg_token_len),
        "low_stopword_ratio": sw_ratio < min_stopword_ratio,
        "low_unique_ratio": uniq_ratio < min_unique_ratio,
        "high_digit_ratio": digits > max_digit_ratio,
    }
    reasons = F.filter(
        F.array(
            *[
                F.when(conds[name], F.lit(name))
                for name in QUALITY_RULES
            ]
        ),
        lambda x: x.isNotNull(),
    )
    return df.select(
        F.col(id_col),
        n.cast("bigint").alias("n_tokens"),
        (F.size(reasons) == 0).alias("keep"),
        F.array_join(reasons, ",").alias("reasons"),
    )


def token_length_histogram(
    df, text_col: str, *, bucket_width: int = 50
) -> "DataFrame":
    """Token-count histogram: ``(bucket, n_docs, total_tokens)`` with
    ``bucket = floor(n_tokens / width) * width``.

    The sequence-length planning input for packing/chunking decisions
    (choosing ``chunk_size``, estimating pack fill rates): one partial-
    aggregated groupBy over a map-side token count — the number of
    groups is ~``max_len / width``, constant in corpus size.
    """
    n = token_count(F.col(text_col))
    bucket = (F.floor(n / F.lit(bucket_width)) * bucket_width).cast("bigint")
    return (
        df.select(bucket.alias("bucket"), n.alias("__n"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__n").cast("bigint").alias("total_tokens"),
        )
    )


def normalize_unicode(
    df, text_col: str, *, form: str = "NFC", out_col: str | None = None
):
    """Unicode-normalize ``text_col`` (default NFC) — the multilingual
    prerequisite for content hashing: composed and decomposed encodings
    of the same glyphs ("À" vs "A"+U+0300) must fingerprint identically
    before any dedup/decontamination pass, or re-crawls with different
    encoders silently escape deduplication.

    Arrow-batched ``unicodedata.normalize`` (no JVM builtin exists for
    this); map-side, stateless, stream-safe. DuckDB's ``nfc_normalize``
    reproduces the NFC form for the oracle.
    """
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"form must be a unicodedata form, got {form!r}")
    from polars_nexpresso_spark.functions._vectorized import (
        pandas_unicode_normalize,
    )

    fn = pandas_unicode_normalize(form)
    return df.withColumn(out_col or text_col, fn(F.col(text_col)))


def nb_quality_model(
    positive: DataFrame,
    negative: DataFrame,
    text_col: str,
    *,
    alpha: float = 0.5,
) -> DataFrame:
    """Train a unigram naive-Bayes quality classifier: per-token
    add-``alpha`` smoothed log-odds of the positive (high-quality
    reference, e.g. curated wiki/books) vs negative (raw crawl) corpus —
    the classic cheap stand-in for the fastText/LR quality filters used
    to curate GPT-3/CCNet-style training mixes. Higher score = more
    positive-like.

    Scale shape: each corpus reduces to a token-count table in ONE
    map-side-combine aggregation; the model is their full-outer join
    (vocab-size rows) with the scalar totals attached as broadcast
    1-row aggregates that branch above the count shuffles (exchange
    reuse — each corpus is scanned once, the DSIR pattern). No driver
    collection; the model stays a DataFrame for :func:`nb_quality_score`
    to broadcast-join.

    Returns ``(token, log_odds)`` — pass to :func:`nb_quality_score`.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be positive: {alpha}")

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(F.explode(tokens(F.col(text_col))).alias("token"))
            .groupBy("token")
            .agg(F.count("*").alias(name))
        )

    cp = counts(positive, "__cp")
    cn = counts(negative, "__cn")
    vocab = (
        cp.join(cn, on="token", how="full_outer")
        .withColumn("__cp", F.coalesce("__cp", F.lit(0)))
        .withColumn("__cn", F.coalesce("__cn", F.lit(0)))
    )
    totals = vocab.agg(
        F.sum("__cp").alias("__np"),
        F.sum("__cn").alias("__nn"),
        F.count("*").alias("__v"),
    )
    a = float(alpha)
    log_odds = (
        F.log((F.col("__cp") + F.lit(a))
              / (F.col("__np") + F.lit(a) * F.col("__v")))
        - F.log((F.col("__cn") + F.lit(a))
                / (F.col("__nn") + F.lit(a) * F.col("__v")))
    )
    return vocab.crossJoin(F.broadcast(totals)).select(
        "token", log_odds.alias("log_odds")
    )


def nb_quality_score(
    docs: DataFrame,
    model: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Score documents with a :func:`nb_quality_model`: per doc, the
    mean per-token log-odds (mean rather than sum so scores are
    length-comparable — the CCNet convention for perplexity-style
    filters). Out-of-vocabulary tokens contribute 0 (neutral — with
    both corpora smoothed over the SAME vocab, an unseen token carries
    no evidence either way).

    Scale shape: explode tokens, LEFT JOIN the model on the token
    (broadcast when the vocab fits — the usual case; Catalyst/AQE
    decides), one per-doc aggregation. Docs with no tokens emit no row.

    Returns ``(id_col, n_tokens, nb_logodds)``.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )
    return (
        toks.join(model, on="token", how="left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.sum(F.coalesce("log_odds", F.lit(0.0))) / F.count("*"),
                6,
            ).alias("nb_logodds"),
        )
    )


def nb_quality_score_stream(
    docs,
    positive: DataFrame,
    negative: DataFrame,
    text_col: str,
    *,
    alpha: float = 0.5,
    max_vocab: int = 5_000_000,
):
    """Stream-safe :func:`nb_quality_score`: STATELESS, map-side only.

    The batch scorer joins exploded tokens against the model table and
    aggregates per doc — a join plus a grouped aggregation a stream
    would need watermarked state for. This variant collects the model
    ONCE into a sorted hash-keyed numpy dictionary (bounded by
    ``max_vocab``) and scores each incoming document with a vectorized
    binary-search probe per Arrow batch: no join, no shuffle, no state —
    works identically on a batch DataFrame or an unbounded
    ``readStream`` (the same pattern as
    :func:`ngram_lm_score_stream` / ``decontaminate_stream``).

    Dictionary keys are xxhash64 of the token (counts re-aggregated per
    hash, so the dictionary is internally consistent; a 64-bit collision
    merging two tokens is astronomically unlikely at real vocab sizes).
    ``positive``/``negative`` must be batch DataFrames (they are
    collected). Returns the input schema plus ``(n_tokens,
    nb_logodds)``; docs with NULL/empty text get ``n_tokens=0`` and a
    NULL score (the batch scorer emits no row for them — filter
    ``n_tokens > 0`` for identical survivors).
    """
    import numpy as np

    from polars_nexpresso_spark.functions._vectorized import pandas_nb_score

    if alpha <= 0:
        raise ValueError(f"alpha must be positive: {alpha}")

    def hash_counts(df: DataFrame):
        pdf = (
            df.select(F.explode(tokens(F.col(text_col))).alias("__t"))
            .select(F.xxhash64("__t").alias("__h"))
            .groupBy("__h")
            .agg(F.count("*").alias("__c"))
            .toPandas()
        )
        return (
            pdf["__h"].to_numpy(dtype=np.int64),
            pdf["__c"].to_numpy(dtype=np.float64),
        )

    ph, pc = hash_counts(positive)
    nh, nc = hash_counts(negative)
    union = np.union1d(ph, nh)
    if union.size > max_vocab:
        raise ValueError(
            f"model vocabulary has {union.size} tokens > "
            f"max_vocab={max_vocab}; use the batch nb_quality_score "
            "join path for vocabularies this large"
        )
    cp = np.zeros(union.size)
    cp[np.searchsorted(union, ph)] = pc
    cn = np.zeros(union.size)
    cn[np.searchsorted(union, nh)] = nc
    a = float(alpha)
    lo = np.log((cp + a) / (cp.sum() + a * union.size)) - np.log(
        (cn + a) / (cn.sum() + a * union.size)
    )

    score = pandas_nb_score(union, lo)
    toks = tokens(F.col(text_col))
    valid = F.size(toks) > 0
    hashes = F.when(valid, F.transform(toks, lambda t: F.xxhash64(t)))
    return (
        docs.withColumn("__th", hashes)
        .withColumn(
            "n_tokens",
            F.when(valid, F.size("__th")).otherwise(F.lit(0)).cast("bigint"),
        )
        .withColumn("nb_logodds", score(F.col("__th")))
        .drop("__th")
    )


def token_shift_topk(
    old: DataFrame,
    new: DataFrame,
    text_col: str,
    *,
    k: int = 20,
    alpha: float = 0.5,
) -> DataFrame:
    """Corpus DRIFT between two snapshots: the ``k`` tokens contributing
    most to the Jensen-Shannon divergence of the unigram distributions —
    the distribution-level complement of ``sources.io``'s id-level
    ``corpus_diff`` (a recrawl can keep every document id and still
    shift WHAT the corpus says; mixture and filter changes show up here
    first, which is what a between-snapshot data-quality gate needs).

    Per token ``t`` with add-``alpha`` smoothed probabilities
    ``p/q = (count + alpha) / (N + alpha·V)`` (V = UNION vocab, so both
    distributions smooth over the same support and a token absent from
    one side contributes its full mass):
    ``js_t = (q·ln(q/m) + p·ln(p/m)) / 2`` with ``m = (p+q)/2`` —
    non-negative, and ``sum(js_t)`` over the union vocab is the total
    JS divergence in nats. ``direction`` is +1 where the token grew.

    Scale shape: one explode + hash count agg per corpus (map-side
    combine — the shuffles carry ~vocab, not corpus, rows), a full
    outer equi-join of the two vocab tables on the token, the three
    scalars (two totals + union vocab size) attach as a broadcast 1-row
    aggregate, and the final top-k is a TakeOrdered with the
    (js desc, token asc) deterministic tie-break. Contributions round
    to 9 decimals so ranking is engine-reproducible.

    Returns ``(token, count_old, count_new, js_contrib, direction,
    rank)``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0: {alpha}")
    from pyspark.sql.window import Window

    def vocab(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(F.explode(tokens(F.col(text_col))).alias("token"))
            .groupBy("token")
            .agg(F.count("*").alias(name))
        )

    merged = (
        vocab(old, "count_old")
        .join(vocab(new, "count_new"), on="token", how="full_outer")
        .select(
            "token",
            F.coalesce("count_old", F.lit(0)).alias("count_old"),
            F.coalesce("count_new", F.lit(0)).alias("count_new"),
        )
    )
    scalars = merged.agg(
        F.sum("count_old").alias("__no"),
        F.sum("count_new").alias("__nn"),
        F.count("*").alias("__v"),
    )
    j = merged.crossJoin(F.broadcast(scalars))
    a = F.lit(float(alpha))
    q = (F.col("count_old") + a) / (F.col("__no") + a * F.col("__v"))
    p = (F.col("count_new") + a) / (F.col("__nn") + a * F.col("__v"))
    m = (p + q) / 2
    js = F.round((q * F.log(q / m) + p * F.log(p / m)) / 2, 9)
    scored = j.select(
        "token",
        "count_old",
        "count_new",
        js.alias("js_contrib"),
        F.when(p >= q, F.lit(1)).otherwise(F.lit(-1)).alias("direction"),
    )
    top = scored.orderBy(
        F.col("js_contrib").desc(), F.col("token").asc()
    ).limit(k)
    # <= k survivors; the unpartitioned window is bounded by construction.
    w = Window.orderBy(F.col("js_contrib").desc(), F.col("token").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("bigint"))


def truncate_tokens(
    df: DataFrame,
    text_col: str,
    max_tokens: int,
    *,
    out_col: str | None = None,
) -> DataFrame:
    """Cap each document at its first ``max_tokens`` whitespace tokens —
    the sequence-length guard that runs before ``sequence_pack`` /
    ``take_token_budget`` so one pathological multi-megabyte document
    cannot blow the packing math or an executor's row buffer.

    Appends ``n_tokens`` (the ORIGINAL token count — the planning input
    for length histograms even after the cut) and ``was_truncated``.
    Case and token order are preserved; whitespace runs normalize to
    single spaces in the output (the tokens are rejoined with ' ').
    NULL text stays NULL with ``n_tokens`` 0.

    Map-side only: one Project over the scan — no shuffle, no Python,
    no state, identical under ``readStream``. At 100 TB the cost is the
    scan itself; there is nothing to partition or salt. Line-boundary
    truncation is the composition ``chunk_documents`` (size =
    max_tokens, first chunk) when chunk edges must respect structure.
    """
    if text_col not in df.columns:
        raise ValueError(f"column {text_col!r} not in DataFrame")
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    target = out_col or text_col
    raw = F.col(text_col)
    # Strip ALL whitespace at the edges (F.trim handles only spaces)
    # so edge newlines/tabs never produce empty edge tokens.
    stripped = F.regexp_replace(raw, r"^\s+|\s+$", "")
    toks = F.when(
        F.length(stripped) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(stripped, r"\s+"))
    n = F.size(toks).cast("bigint")
    kept = F.slice(toks, 1, max_tokens)
    return (
        df.withColumn("n_tokens", F.coalesce(n, F.lit(0)).cast("bigint"))
        .withColumn("was_truncated", F.coalesce(n > max_tokens, F.lit(False)))
        .withColumn(
            target,
            F.when(raw.isNull(), F.lit(None).cast("string")).otherwise(
                F.array_join(kept, " ")
            ),
        )
    )


def compression_ratio(
    df: DataFrame, text_col: str, *, out_col: str = "compression_ratio"
) -> DataFrame:
    """Per-doc deflate compression ratio (compressed/raw UTF-8 bytes) —
    the entropy-flavored quality signal the regex ratios can't see:
    machine-generated/templated text compresses far below prose
    (boilerplate, keyword stuffing, log spam), while binary-ish noise
    sits near 1.0. Gate on BOTH tails next to :func:`quality_filter`'s
    rule columns.

    Arrow-batched ``pandas_udf`` (zlib has no JVM expression — the same
    justified-Python class as unicode normalization); map-side, no
    shuffle, stream-safe. NULL/empty text → NULL ratio.
    """
    from polars_nexpresso_spark.functions._vectorized import (
        pandas_compression_ratio,
    )

    if text_col not in df.columns:
        raise ValueError(f"column {text_col!r} not in DataFrame")
    return df.withColumn(
        out_col, pandas_compression_ratio(F.col(text_col))
    )


def unique_ngram_fraction(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 3,
) -> DataFrame:
    """Per-document NOVELTY: the fraction of a document's distinct word
    n-grams that occur in NO other document of the corpus — high for
    original prose, near zero for templated/recombined/scraped-together
    text whose every phrase exists elsewhere. The per-document
    complement of :func:`~polars_nexpresso_spark.functions.dedup
    .duplicated_window_fraction` (that one asks "how much of this doc is
    duplicated", this one asks "how much is unique corpus-wide"), and a
    ranking signal for novelty-first sampling.

    Returns one row per input row: ``(id_col, n_grams, n_unique,
    novelty_frac)`` where ``novelty_frac = round(n_unique / n_grams, 9)``
    and documents with no tokens get ``n_grams = 0`` and NULL fraction.

    Scale shape: the text is read once — the explode emits 64-bit
    shingle hashes, so every exchange carries ``(id, hash)`` longs.
    Document frequency is one hash aggregation over distinct shingles
    (map-side combine); globally-unique shingles (df == 1) already KNOW
    their owning document (``min(id) == the only id``), so novelty
    counts come from a second hash agg on the owner id — no join back
    through the shingle table. Per-doc totals attach by one id-keyed
    left join (docs absent from the unique set coalesce to 0).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1: {n}")
    if text_col not in df.columns or id_col not in df.columns:
        raise ValueError(
            f"columns {text_col!r}/{id_col!r} not both in {df.columns}"
        )
    # NULL text reaches word_ngrams as a NULL token array, which emits a
    # single NULL shingle (size(NULL) is -1 under non-ANSI semantics) —
    # filter it so NULL-text documents count zero grams. Empty text keeps
    # its one ''-shingle (the word_ngrams short-doc convention).
    exploded = (
        df.select(
            F.col(id_col).alias("__id"),
            F.explode(word_ngrams(F.col(text_col), n)).alias("__sh"),
        )
        .filter(F.col("__sh").isNotNull())
        .select("__id", F.xxhash64(F.col("__sh")).alias("__h"))
    )
    # word_ngrams is per-doc distinct, so count(*) per hash == document
    # frequency and min(__id) is the unique owner when that count is 1.
    freq = exploded.groupBy("__h").agg(
        F.count("*").alias("__df"), F.min("__id").alias("__owner")
    )
    uniq = (
        freq.filter(F.col("__df") == 1)
        .groupBy(F.col("__owner").alias("__id"))
        .agg(F.count("*").alias("n_unique"))
    )
    per_doc = exploded.groupBy("__id").agg(F.count("*").alias("n_grams"))
    joined = per_doc.join(uniq, on="__id", how="left")
    counted = df.select(F.col(id_col)).join(
        joined.withColumnRenamed("__id", id_col), on=id_col, how="left"
    )
    return counted.select(
        F.col(id_col),
        F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
        F.coalesce("n_unique", F.lit(0)).cast("bigint").alias("n_unique"),
        F.round(
            F.try_divide(
                F.coalesce("n_unique", F.lit(0)), F.col("n_grams")
            ),
            9,
        ).alias("novelty_frac"),
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str,
    *,
    k: int = 20,
    min_count: int = 5,
) -> DataFrame:
    """Corpus collocations: the ``k`` adjacent token pairs with the
    highest pointwise mutual information — phrases whose words co-occur
    far more than their individual frequencies predict ("new york",
    "machine learning"). The classic vocabulary-mining pass for building
    phrase lists (tokenizer merges, stop-phrase screens, domain
    glossaries) over a corpus too large to n-gram-count on one machine.

    ``pmi = ln(c_ab · N_uni² / (N_bi · c_a · c_b))`` with unigram/bigram
    counts over the whole corpus; ``min_count`` floors the bigram count
    so one-off juxtapositions of two rare words (which maximize raw PMI)
    are excluded. Rounded to 9 decimals; ties break on (w1, w2) asc.

    Scale shape: one explode + hash agg per table — unigram counts and
    adjacent-bigram counts, both with map-side combine, shuffles ~vocab
    sized. The two totals ride one broadcast 1-row aggregate; the bigram
    table joins unigram counts twice on the token (vocab-sized equi-
    joins, AQE handles skew). Final top-k is a TakeOrdered over the
    ``min_count`` survivors. Returns ``(w1, w2, pair_count, pmi, rank)``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1: {min_count}")
    from pyspark.sql.window import Window

    toks = tokens(F.col(text_col))
    uni = (
        df.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("__c"))
    )
    # Adjacent pairs WITH duplicates: zip tokens against themselves
    # shifted by one (slice from position 2), then explode the structs.
    pairs = df.select(
        F.explode(
            F.zip_with(
                F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
                F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    bi = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
    )
    totals = uni.agg(F.sum("__c").alias("__n_uni")).crossJoin(
        F.broadcast(
            df.select(
                F.greatest(F.size(toks) - 1, F.lit(0)).alias("__nb")
            ).agg(F.sum("__nb").alias("__n_bi"))
        )
    )
    scored = (
        bi.join(
            uni.select(F.col("token").alias("w1"), F.col("__c").alias("__ca")),
            on="w1",
        )
        .join(
            uni.select(F.col("token").alias("w2"), F.col("__c").alias("__cb")),
            on="w2",
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "pair_count",
            F.round(
                F.log(
                    (
                        F.col("pair_count").cast("double")
                        * F.col("__n_uni").cast("double")
                        * F.col("__n_uni").cast("double")
                    )
                    / (
                        F.col("__n_bi").cast("double")
                        * F.col("__ca").cast("double")
                        * F.col("__cb").cast("double")
                    )
                ),
                9,
            ).alias("pmi"),
        )
    )
    top = scored.orderBy(
        F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(k)
    # <= k survivors; the unpartitioned window is bounded by construction.
    w = Window.orderBy(F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("bigint"))


def oov_rate(
    df,
    text_col: str,
    group_col: str,
    *,
    vocab_size: int = 1000,
):
    """Tokenizer-coverage report: the fraction of token OCCURRENCES per
    group that fall outside the corpus's top-``vocab_size`` unigram
    vocabulary — the dial that says whether a planned vocabulary covers
    every source (a source with high OOV rate will fragment into
    characters under BPE/unigram encoding and eat the token budget).

    Vocabulary = the ``vocab_size`` most frequent whitespace tokens
    corpus-wide, ties broken alphabetically — one partial-agg token
    count, then a bounded ``TakeOrdered`` (never a global sort). The
    per-group measurement joins token counts (not token rows) against
    the broadcast vocabulary: the exchange carries one row per DISTINCT
    (group, token), Zipf-small next to the corpus, and the vocabulary
    side is ``vocab_size`` rows by construction. The count table feeds
    BOTH the vocabulary and the measurement, so it is persisted
    (MEMORY_AND_DISK, Zipf-small) — without the cache the corpus-scale
    tokenize+count pipeline evaluates twice. The cache is registered
    with the shared tracked registry; long-lived sessions calling this
    repeatedly over different corpora should release between corpora
    via :func:`~polars_nexpresso_spark.functions.dedup
    .release_blocking_caches`. NULL/empty texts contribute no tokens.

    Returns ``(group_col, n_tokens, n_oov, oov_rate)`` with ``oov_rate``
    rounded to 9 (NULL when the group has no tokens).
    """
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1: {vocab_size}")
    if text_col not in df.columns or group_col not in df.columns:
        raise ValueError(
            f"columns {text_col!r}/{group_col!r} not both in {df.columns}"
        )
    tok_rows = df.select(
        F.col(group_col), F.explode(tokens(F.col(text_col))).alias("__tok")
    )
    # Registered with the shared tracked-cache registry: a lazy return
    # gives this function no "last action" to unpersist on, so without
    # tracking every call would leak a cache entry for the session's
    # lifetime. Long-lived sessions release between corpora via
    # dedup.release_blocking_caches() (same contract as the LSH
    # blocking tables).
    from polars_nexpresso_spark.functions._caching import persist_tracked

    counts = persist_tracked(
        tok_rows.groupBy(group_col, "__tok").agg(F.count("*").alias("__n"))
    )
    vocab = (
        counts.groupBy("__tok")
        .agg(F.sum("__n").alias("__freq"))
        .orderBy(F.col("__freq").desc(), F.col("__tok").asc())
        .limit(vocab_size)
        .select("__tok", F.lit(True).alias("__in_vocab"))
    )
    return (
        counts.join(F.broadcast(vocab), on="__tok", how="left")
        .groupBy(group_col)
        .agg(
            F.sum("__n").cast("bigint").alias("n_tokens"),
            F.sum(
                F.when(F.col("__in_vocab").isNull(), F.col("__n")).otherwise(
                    F.lit(0)
                )
            )
            .cast("bigint")
            .alias("n_oov"),
        )
        .withColumn(
            "oov_rate",
            F.round(
                F.col("n_oov")
                / F.when(F.col("n_tokens") > 0, F.col("n_tokens")),
                9,
            ),
        )
    )


def lexical_diversity(
    df,
    text_col: str,
    id_col: str,
):
    """Per-document lexical-diversity signals: type-token ratio
    (distinct / total tokens) and hapax ratio (tokens occurring exactly
    once / total) — the classic cheap complements to the repetition
    gate: template/boilerplate text scores LOW TTR, keyword-stuffed or
    machine-generated lists score anomalously HIGH hapax. Both are pure
    per-row array arithmetic over the shared whitespace tokenizer — no
    explode, no shuffle, stream-safe.

    Returns ``(id_col, n_tokens, n_types, ttr, hapax_ratio)`` rounded
    to 9; NULL text and empty token lists yield NULL ratios (n_tokens
    0), never a division error.
    """
    if text_col not in df.columns or id_col not in df.columns:
        raise ValueError(
            f"columns {text_col!r}/{id_col!r} not both in {df.columns}"
        )
    # Coalesce the token ARRAY (not just size()) so NULL text is an
    # empty list before size() ever runs: under legacy non-ANSI
    # sizeOfNull semantics size(NULL) is -1, which would leak
    # n_tokens/n_types=-1 and break the documented "n_tokens 0"
    # contract (same fix as bm25_route_stream, retrieval.py).
    toks = F.coalesce(
        tokens(F.col(text_col)), F.array().cast("array<string>")
    )
    staged = df.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_types"),
        F.array_sort(toks).alias("__srt"),
    )
    # hapax count on the SORTED token array: a token occurs exactly once
    # iff it differs from both sorted neighbors — one array_sort + one
    # index pass, O(n log n) per row, where the naive count-each-
    # distinct-token-in-the-list form is O(types x tokens) and quadratic
    # on long documents. The sorted array sits in its own projection so
    # its many get() references evaluate it once; out-of-range get() is
    # NULL, coalesced to "differs" at the boundaries.
    srt = F.col("__srt")
    n = F.size(srt)

    def _is_hapax(i):
        return F.when(
            F.coalesce(F.get(srt, i - 1) != F.get(srt, i), F.lit(True))
            & F.coalesce(F.get(srt, i + 1) != F.get(srt, i), F.lit(True)),
            F.lit(1),
        ).otherwise(F.lit(0))

    hapax = F.when(
        n > 0,
        F.aggregate(
            F.sequence(F.lit(0), n - 1),
            F.lit(0).cast("long"),
            lambda acc, i: acc + _is_hapax(i),
        ),
    ).otherwise(F.lit(0))
    denom = F.when(F.col("n_tokens") > 0, F.col("n_tokens"))
    return (
        staged.withColumn("__hapax", F.coalesce(hapax, F.lit(0)))
        .withColumn("ttr", F.round(F.col("n_types") / denom, 9))
        .withColumn("hapax_ratio", F.round(F.col("__hapax") / denom, 9))
        .drop("__srt", "__hapax")
    )


def oov_annotate_stream(
    df,
    text_col: str,
    vocab_ref,
    *,
    vocab_size: int = 1000,
):
    """Stream-safe per-document OOV annotation: tag every incoming
    document with its token count and how many of those tokens fall
    outside a FROZEN vocabulary — the per-row half of :func:`oov_rate`
    an ingest gate runs on an unbounded ``readStream`` (route
    high-OOV docs to review, or weight them down before they fragment
    under the tokenizer).

    The vocabulary is the top-``vocab_size`` unigram vocabulary of
    ``vocab_ref`` (a BATCH frame — the reference corpus; same
    ``(freq desc, token asc)`` rule as :func:`oov_rate`), collected
    ONCE into a sorted token-hash dictionary — the driver transfer is
    ``vocab_size`` longs by construction, the frozen-model split of
    ``nb_quality_score_stream``/``lm_score_stream``. Each row hashes
    its tokens JVM-side and counts membership in one Arrow-batched
    binary search (:func:`~polars_nexpresso_spark.functions._vectorized
    .pandas_member_count`) — no join, no shuffle, no state; identical
    on a batch frame and a stream. Aggregating the per-doc counts by
    group reproduces :func:`oov_rate` exactly (test-pinned).

    NULL text → 0 tokens, NULL rate (the row still flows). Returns the
    input columns plus ``(n_tokens, n_oov, oov_rate)`` (rate rounded
    to 9).
    """
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1: {vocab_size}")
    if text_col not in df.columns or text_col not in vocab_ref.columns:
        raise ValueError(f"both frames need column {text_col!r}")
    import numpy as np

    from polars_nexpresso_spark.functions._vectorized import (
        pandas_member_count,
    )

    vocab_rows = (
        vocab_ref.select(
            F.explode(tokens(F.col(text_col))).alias("__tok")
        )
        .groupBy("__tok")
        .agg(F.count("*").alias("__freq"))
        .orderBy(F.col("__freq").desc(), F.col("__tok").asc())
        .limit(vocab_size)
        .select(F.xxhash64("__tok").alias("__h"))
        .collect()
    )
    vocab_sorted = np.sort(
        np.array([r["__h"] for r in vocab_rows], dtype=np.int64)
    )
    in_count = pandas_member_count(vocab_sorted).asNondeterministic()
    # NULL text → empty ARRAY before size(): legacy non-ANSI
    # sizeOfNull would report size(NULL) = -1, violating the
    # documented "NULL text → 0 tokens" contract and the pinned
    # aggregate-to-oov_rate parity (same fix as bm25_route_stream).
    toks = F.coalesce(
        tokens(F.col(text_col)), F.array().cast("array<string>")
    )
    tok_hashes = F.transform(toks, lambda t: F.xxhash64(t))
    n_tok = F.size(toks).cast("bigint")
    annotated = df.withColumn(
        "n_tokens", n_tok
    ).withColumn(
        "__in", F.coalesce(in_count(tok_hashes), F.lit(0)).cast("bigint")
    )
    return (
        annotated.withColumn(
            "n_oov", (F.col("n_tokens") - F.col("__in")).cast("bigint")
        )
        .withColumn(
            "oov_rate",
            F.round(
                F.col("n_oov")
                / F.when(F.col("n_tokens") > 0, F.col("n_tokens")),
                9,
            ),
        )
        .drop("__in")
    )


def quality_calibrate(
    df,
    score_col: str,
    group_col: str,
    id_col: str,
):
    """Per-group percent-rank calibration of a quality score — the
    standard normalization step before a single global quality
    threshold is applied across heterogeneous sources: raw classifier /
    heuristic scores are not comparable across domains (code scores
    cluster high, web-crawl scores low), so a global cut keeps whole
    domains and drops others; calibrating each score to its rank
    WITHIN its source makes "keep the top 30% of every source" a
    one-predicate filter.

    Scale shape: ONE partitioned window (hash exchange on
    ``group_col``, per-group sort) — no global sort, no driver
    collection; the per-group sort is the exact cost a per-source
    quantile cut would pay anyway. Rows with NULL scores calibrate to
    NULL and are EXCLUDED from the rank denominator (they would
    otherwise pin percent_rank's NULLS FIRST ordering to engine
    defaults, which differ between engines).

    Returns ``(id_col, group_col, score_col, calibrated)`` with
    ``calibrated`` = percent_rank in [0, 1] ascending (rounded to 9;
    ties share a rank, single-row groups calibrate to 0.0).
    """
    from pyspark.sql.window import Window

    for c in (score_col, group_col, id_col):
        if c not in df.columns:
            raise ValueError(f"column {c!r} not in {df.columns}")
    base = df.select(id_col, group_col, score_col)
    scored = base.filter(F.col(score_col).isNotNull())
    w = Window.partitionBy(group_col).orderBy(F.col(score_col).asc())
    ranked = scored.withColumn(
        "calibrated", F.round(F.percent_rank().over(w), 9)
    )
    nulls = base.filter(F.col(score_col).isNull()).withColumn(
        "calibrated", F.lit(None).cast("double")
    )
    return ranked.unionByName(nulls)


def char_entropy(
    df,
    text_col: str,
    id_col: str,
):
    """Per-document character-level Shannon entropy (natural log) — the
    cheap gibberish detector that complements :func:`repetition` and
    :func:`lexical_diversity`: base64 blobs, binary spills, and
    hex dumps score anomalously HIGH (near-uniform character use),
    padded/repeated-character boilerplate scores near ZERO, natural
    language sits in a narrow band per script. A standard pretraining
    gate alongside length/stopword filters.

    Scale shape: pure per-row array arithmetic, ZERO shuffle, zero
    Python (plan-budgeted). The per-row character histogram is never
    materialized as rows — the text's chars are ``array_sort``-ed (the
    same sorted-neighbor trick :func:`lexical_diversity` uses for
    hapax counting) and ONE forward ``F.aggregate`` pass over the
    sorted array run-length-encodes it, folding
    ``H = -Σ (run/n)·ln(run/n)`` as each run closes — O(n log n) per
    row (the sort dominates; the pass is O(n)), no explode. (An
    explode+groupBy formulation would shuffle one row PER CHARACTER —
    the shape that dies at 100 TB.) The sorted array is staged as a
    real column BEFORE any lambda touches it: Spark higher-order-
    function lambdas re-evaluate non-argument expressions per element,
    so referencing ``array_sort(split(...))`` inside a lambda body
    re-splits and re-sorts the text once per character —
    O(len²·log len) per row, the rake this function shipped with in
    round 10 (83 s for 1.5 MB of text) before being restaged.

    Returns ``(id_col, n_chars, entropy)`` — entropy rounded to 9,
    NULL for NULL/empty text (``n_chars`` 0 for empty, NULL for NULL).
    """
    if text_col not in df.columns or id_col not in df.columns:
        raise ValueError(
            f"columns {text_col!r}/{id_col!r} not both in {df.columns}"
        )
    txt = F.col(text_col)
    # The empty-string filter pins the histogram against split('')'s
    # version-sensitive trailing-empty behavior (a no-op on Spark 4.1,
    # verified live — a phantom '' symbol would shift every entropy).
    staged = df.select(
        F.col(id_col),
        F.length(txt).cast("bigint").alias("n_chars"),
        F.array_sort(
            F.filter(F.split(txt, ""), lambda c: c != F.lit(""))
        ).alias("__srt"),
    ).withColumn("__n", F.size(F.col("__srt")))
    n = F.col("__n")

    # Carry (prev char, open-run length, accumulator) across the sorted
    # array; a boundary (or the finish lambda) closes the open run by
    # folding its (run/n)·ln(run/n) term. The only non-argument
    # expression the lambdas reference is the plain column read __n —
    # O(1) per element. Terms accumulate in sorted-run order with the
    # exact per-term expression of the round-10 formulation, so the
    # round(…, 9) values are bitwise-identical to the sealed oracle.
    def _close_run(acc):
        return F.when(
            acc["run"] > 0,
            acc["acc"] + (acc["run"] / n) * F.log(acc["run"] / n),
        ).otherwise(acc["acc"])

    ent = -F.aggregate(
        F.col("__srt"),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0.0).alias("acc"),
        ),
        lambda acc, c: F.struct(
            c.alias("prev"),
            F.when(acc["prev"].eqNullSafe(c), acc["run"] + F.lit(1))
            .otherwise(F.lit(1))
            .cast("long")
            .alias("run"),
            F.when(acc["prev"].eqNullSafe(c), acc["acc"])
            .otherwise(_close_run(acc))
            .alias("acc"),
        ),
        _close_run,
    )
    return staged.select(
        F.col(id_col),
        F.col("n_chars"),
        F.round(F.when(n > 0, ent), 9).alias("entropy"),
    )


# Control characters that signal a binary spill / wrong decode when they
# appear in "text": C0 controls except tab/newline/carriage-return, plus
# DEL. U+FFFD is the decoder's own replacement marker — any nonzero
# count means bytes were already lost upstream.
_CONTROL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
_REPLACEMENT_RE = "�"


def encoding_quality(
    df,
    text_col: str,
    id_col: str,
):
    """Per-document encoding-health gate: how much of the text is
    decoder damage (U+FFFD replacement characters — bytes already lost
    upstream) or stray control characters (binary spilled into a text
    column, wrong charset decode). The standard ingest check BEFORE
    language-ID/quality scoring — mojibake fragments under the
    tokenizer and poisons every downstream signal, so pipelines route
    high-ratio docs to re-extraction rather than scoring them.

    Pure map-side ``regexp_count`` projections — zero shuffle, zero
    Python (plan-budgeted). Returns ``(id_col, n_chars, n_replacement,
    n_control, replacement_ratio, control_ratio)`` — ratios rounded to
    9, NULL for NULL/empty text (``n_chars`` 0 for empty, NULL for
    NULL).
    """
    if text_col not in df.columns or id_col not in df.columns:
        raise ValueError(
            f"columns {text_col!r}/{id_col!r} not both in {df.columns}"
        )
    txt = F.col(text_col)
    n = F.length(txt)
    n_rep = F.regexp_count(txt, F.lit(_REPLACEMENT_RE))
    n_ctl = F.regexp_count(txt, F.lit(_CONTROL_RE))
    denom = F.when(n > 0, n.cast("double"))
    return df.select(
        F.col(id_col),
        n.cast("bigint").alias("n_chars"),
        n_rep.cast("bigint").alias("n_replacement"),
        n_ctl.cast("bigint").alias("n_control"),
        F.round(n_rep / denom, 9).alias("replacement_ratio"),
        F.round(n_ctl / denom, 9).alias("control_ratio"),
    )
