"""Deterministic sampling / splitting for training-data pipelines.

Both operators assign rows by an md5-derived hash of ``(seed, id)`` rather
than an RNG: the assignment is a pure column expression — reproducible
across runs, machines, partitionings, and engines (the DuckDB oracles
reproduce it bit-for-bit with the same md5 arithmetic, like
``text.token_hash60``). That determinism is the property that matters at
100 TB: a re-run, a retried task, or a different cluster layout yields the
SAME split, so downstream caches and eval sets stay valid. No shuffle is
introduced — assignment and filtering are map-side.

The hash bucket is ``md5(seed || ':' || id)``'s first 60 bits modulo
``denom`` (default 1_000_000), giving ppm-resolution fractions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = 1_000_000


def hash_bucket(id_col: Column, seed: int = 42, denom: int = _DENOM) -> Column:
    """Deterministic bucket in ``[0, denom)`` from an id column."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % denom


def hash_split(
    df: DataFrame,
    id_col: str,
    *,
    test_frac: float = 0.1,
    seed: int = 42,
) -> DataFrame:
    """Add a ``split`` column: ``'test'`` for ~``test_frac`` of rows,
    ``'train'`` otherwise — decided per id, not per run.

    Rows with equal ids land in the same split (content-addressed ids make
    the split leak-free across duplicates); changing ``seed`` re-deals.
    """
    if not 0.0 <= test_frac <= 1.0:
        raise ValueError(f"test_frac must be in [0, 1], got {test_frac}")
    cut = int(round(test_frac * _DENOM))
    bucket = hash_bucket(F.col(id_col), seed)
    return df.withColumn(
        "split", F.when(bucket < cut, F.lit("test")).otherwise(F.lit("train"))
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    *,
    max_n: int,
    seed: int = 42,
    skew_salt: int | None = None,
) -> DataFrame:
    """Keep at most ``max_n`` rows per group — the per-domain/per-source
    cap that stops any single origin from dominating a training mix.

    WHICH rows survive is decided by the md5 hash of the id (then id as the
    tie-break), not arrival order or partition layout, so the cap is
    deterministic across runs, partitionings, and engines — same property
    as :func:`hash_split`. One shuffle (the window partition on
    ``group_col``); groups under the cap pass through untouched.

    ``skew_salt=S`` (opt-in; decide with ``plans.stats.key_skew_stats``)
    handles a pathologically hot group with the IMPLEMENTED two-phase
    form: partial cap per ``(group, salt-of-id-hash)`` — the hot group
    spreads over S window partitions — then a final cap over the
    ``<= S * max_n`` survivors per group. Because the (hash, id) order
    is total, the two-phase result is IDENTICAL to the single-window
    result; the extra shuffle only pays off under real skew.
    """
    from pyspark.sql.window import Window

    if max_n <= 0:
        raise ValueError(f"max_n must be positive, got {max_n}")
    order = [hash_bucket(F.col(id_col), seed).asc(), F.col(id_col).asc()]
    out = df
    if skew_salt is not None:
        if skew_salt <= 1:
            raise ValueError(f"skew_salt must be > 1: {skew_salt}")
        salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(int(skew_salt)))
        w1 = Window.partitionBy(F.col(group_col), salt).orderBy(*order)
        out = (
            out.withColumn("__rn", F.row_number().over(w1))
            .filter(F.col("__rn") <= max_n)
            .drop("__rn")
        )
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_n)
        .drop("__rn")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    *,
    fractions: dict | float,
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-stratum sample: keep ~``fraction`` of each stratum.

    ``fractions`` is either one float for every stratum or a
    ``{stratum_value: frac}`` mapping (strata absent from the mapping are
    dropped — the "rebalance a skewed corpus" shape, e.g. downsample the
    dominant language). Assignment is by id hash, so the sample is stable
    across runs and independent of partitioning; no shuffle.
    """
    bucket = hash_bucket(F.col(id_col), seed)
    if isinstance(fractions, dict):
        if len(fractions) <= 64:
            # Few strata: a flat OR chain stays one codegen'd filter.
            cond = F.lit(False)
            for value, frac in fractions.items():
                cut = int(round(float(frac) * _DENOM))
                cond = cond | (
                    (F.col(strata_col) == F.lit(value)) & (bucket < F.lit(cut))
                )
            return df.filter(cond)
        # Many strata (e.g. per-domain fractions over thousands of domains):
        # an expression chain that size bloats the plan, so broadcast the
        # mapping as a tiny dim table instead — inner join drops unmapped
        # strata, matching the expression path's semantics.
        cuts = df.sparkSession.createDataFrame(
            [(v, int(round(float(f) * _DENOM))) for v, f in fractions.items()],
            [strata_col, "__cut"],
        )
        return (
            df.withColumn("__bucket", bucket)
            .join(F.broadcast(cuts), on=strata_col, how="inner")
            .filter(F.col("__bucket") < F.col("__cut"))
            .drop("__bucket", "__cut")
        )
    cut = int(round(float(fractions) * _DENOM))
    return df.filter(bucket < cut)


def source_mix_weights(
    df: DataFrame,
    text_col: str,
    source_col: str,
    targets: dict[str, float],
) -> DataFrame:
    """Per-source downsampling weights that steer the TOKEN mix toward a
    target distribution (the Dolma/Pile mixture-weighting step).

    For each source ``s`` with available token share ``share_s`` and
    target share ``t_s`` (sources absent from ``targets`` get 0), the raw
    ratio ``t_s / share_s`` says how over- or under-represented the
    source is; dividing by the max ratio normalizes to downsample-only
    weights in (0, 1] — sampling each source's docs with probability
    ``weight`` (e.g. via :func:`hash_bucket` thresholding) yields the
    target token proportions from the available data without
    up-sampling.

    Scale shape: one per-source aggregation with map-side combine
    (tokenization is a map-side expression), targets attached via a
    broadcast join of a literal table, and the normalization runs over
    the per-source result — #sources rows, driver-scale — via an
    unbounded window (fine at this cardinality; this is a planning
    table, not row data).

    Returns ``(source, n_docs, n_tokens, token_share, target_share,
    weight)``, one row per source present in the corpus.
    """
    from pyspark.sql import Window

    from polars_nexpresso_spark.functions.text import token_count

    spark = df.sparkSession
    tgt = spark.createDataFrame(
        [(s, float(t)) for s, t in sorted(targets.items())],
        f"{source_col} string, target_share double",
    )
    per_source = (
        df.select(
            F.col(source_col),
            token_count(F.col(text_col)).alias("__tc"),
        )
        .groupBy(source_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__tc").alias("n_tokens"),
        )
        .join(F.broadcast(tgt), on=source_col, how="left")
        .withColumn("target_share", F.coalesce("target_share", F.lit(0.0)))
    )
    everything = Window.partitionBy()
    share = F.col("n_tokens") / F.sum("n_tokens").over(everything)
    # Guard the zero-token-source case like temperature_mix_weights:
    # under ANSI SQL target_share/0 throws while evaluating max_raw's
    # window; with ANSI off it NULLs the weight. Empty sources get an
    # explicit 0.0 instead.
    raw = F.when(F.col("n_tokens") > 0, F.col("target_share") / share)
    max_raw = F.max(raw).over(everything)
    return per_source.select(
        source_col,
        "n_docs",
        "n_tokens",
        F.round(share, 6).alias("token_share"),
        "target_share",
        F.round(
            F.when(
                (F.col("n_tokens") > 0) & (max_raw > 0), raw / max_raw
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("weight"),
    )


def temperature_mix_weights(
    df: DataFrame,
    text_col: str,
    source_col: str,
    *,
    alpha: float = 0.3,
) -> DataFrame:
    """Temperature-scaled mixture weights: the target token share of each
    source is its OBSERVED share raised to ``alpha`` and renormalized
    (the T5 / multilingual-LM sampling rule — ``alpha=1`` keeps the
    natural mix, ``alpha=0`` forces uniform, the 0.2-0.5 band boosts
    small sources without flattening). The companion of
    :func:`source_mix_weights`: that one takes explicit targets, this
    derives them from the corpus itself, so it needs no curation pass.

    Weights are downsample-only (normalized by the max ratio) exactly
    like :func:`source_mix_weights`, and the scale shape is identical —
    one per-source map-side-combine aggregation, then window math over
    the #sources-row planning table.

    Returns ``(source, n_docs, n_tokens, token_share, target_share,
    weight)``.
    """
    from pyspark.sql import Window

    from polars_nexpresso_spark.functions.text import token_count

    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1]: {alpha}")
    per_source = (
        df.select(
            F.col(source_col),
            token_count(F.col(text_col)).alias("__tc"),
        )
        .groupBy(source_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__tc").alias("n_tokens"),
        )
    )
    everything = Window.partitionBy()
    share = F.col("n_tokens") / F.sum("n_tokens").over(everything)
    powered = F.pow(share, F.lit(float(alpha)))
    target = powered / F.sum(powered).over(everything)
    # A zero-token source has share 0: under ANSI SQL target/share would
    # THROW (division by zero) while evaluating max_raw's window, and with
    # ANSI off it yields a NULL weight that apply_mix silently drops.
    # Guard the ratio so empty sources get an explicit weight of 0.0
    # (nothing to sample) and the rest of the table is unaffected.
    raw = F.when(F.col("n_tokens") > 0, target / share)
    max_raw = F.max(raw).over(everything)
    return per_source.select(
        source_col,
        "n_docs",
        "n_tokens",
        F.round(share, 6).alias("token_share"),
        F.round(target, 6).alias("target_share"),
        F.when(F.col("n_tokens") <= 0, F.lit(0.0))
        .otherwise(F.round(raw / max_raw, 6))
        .alias("weight"),
    )


def keep_top_fraction(
    df: DataFrame,
    score_col: str,
    *,
    frac: float,
    by: list[str] | None = None,
    keep: str = "lowest",
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Keep the best ``frac`` of rows by score, per ``by`` group.

    The CCNet perplexity-bucket step: score documents (e.g.
    :func:`~polars_nexpresso_spark.functions.text.ngram_lm_score`, where
    LOW avg ``-ln P`` = fluent), then keep the best fraction per source.
    ``keep='lowest'`` keeps rows with score <= the ``frac``-quantile;
    ``'highest'`` keeps rows >= the ``(1-frac)``-quantile. Rows tied
    with the threshold are all kept, so the kept share can slightly
    exceed ``frac``. NULL scores are dropped.

    The threshold is one exact-percentile aggregation per group
    (``F.percentile``, linear interpolation == SQL ``quantile_cont``),
    broadcast back and applied as a map-side filter — groups are few
    (sources/languages), so the broadcast is trivially small.
    ``approx=True`` swaps in ``approx_percentile`` (one-pass mergeable
    sketch) for the 100 TB path; thresholds then carry sketch error and
    are not oracle-exact. Thresholds are rounded to 6 dp in the
    comparison so the filter is reproducible across engines.
    """
    if not 0 < frac <= 1:
        raise ValueError(f"frac must be in (0, 1]: {frac}")
    if keep not in ("lowest", "highest"):
        raise ValueError(f"keep must be lowest|highest: {keep!r}")
    p = frac if keep == "lowest" else 1.0 - frac
    fn = (
        (lambda c: F.approx_percentile(c, F.lit(p), F.lit(accuracy)))
        if approx
        else (lambda c: F.percentile(c, F.lit(p)))
    )
    score = F.col(score_col).cast("double")
    keys = by or []
    grouped = df.filter(score.isNotNull()).groupBy(*keys)
    thresholds = grouped.agg(
        F.round(fn(score).cast("double"), 6).alias("__thr")
    )
    base = df.filter(score.isNotNull())
    joined = (
        base.join(F.broadcast(thresholds), on=keys)
        if keys
        else base.crossJoin(F.broadcast(thresholds))
    )
    cond = score <= F.col("__thr") if keep == "lowest" else score >= F.col("__thr")
    return joined.filter(cond).drop("__thr")


def score_buckets(
    df: DataFrame,
    score_col: str,
    *,
    fracs: tuple = (1.0 / 3, 2.0 / 3),
    labels: tuple = ("head", "middle", "tail"),
    by: list[str] | None = None,
    approx: bool = False,
    accuracy: int = 10000,
) -> DataFrame:
    """Label every row with its per-group score bucket — CCNet's
    head/middle/tail perplexity bucketing (ascending score = better
    under an LM-score column, so 'head' is the most fluent third).

    ``fracs`` are the quantile cut points (strictly increasing, in
    (0,1)); ``labels`` has ``len(fracs) + 1`` names. A row lands in
    bucket ``i`` when its score is <= the ``fracs[i]``-quantile (first
    match wins, ties land in the better bucket — consistent with
    :func:`keep_top_fraction`). NULL scores get a NULL bucket.

    One exact-percentile aggregation per group computes ALL thresholds
    (``F.percentile`` over the array of fracs), broadcast back, and the
    labeling is a map-side CASE chain — the same two-job shape as
    ``keep_top_fraction`` regardless of bucket count. ``approx=True``
    swaps the sketch in for the 100 TB path. Thresholds round to 6 dp
    for cross-engine reproducibility.

    ``df`` evaluates twice (threshold job + labeled output). Persisting
    it first is NOT a default win — measured on the lm_score composition
    at sf0.1: 2.27 s uncached vs 2.32 s cached (the cache write costs as
    much as the recompute) — but pin it yourself when the upstream plan
    is expensive relative to its output size.
    """
    if len(labels) != len(fracs) + 1:
        raise ValueError(
            f"need len(labels) == len(fracs)+1: {len(labels)} vs {len(fracs)}"
        )
    if list(fracs) != sorted(set(fracs)) or not all(0 < f < 1 for f in fracs):
        raise ValueError(f"fracs must be strictly increasing in (0,1): {fracs}")
    score = F.col(score_col).cast("double")
    keys = by or []
    fn = (
        (lambda c, p: F.approx_percentile(c, F.lit(p), F.lit(accuracy)))
        if approx
        else (lambda c, p: F.percentile(c, F.lit(p)))
    )
    thresholds = (
        df.filter(score.isNotNull())
        .groupBy(*keys)
        .agg(
            *[
                F.round(fn(score, p).cast("double"), 6).alias(f"__thr{i}")
                for i, p in enumerate(fracs)
            ]
        )
    )
    # LEFT join: a group whose scores are ALL NULL has no threshold row —
    # its rows must survive with a NULL bucket, not silently drop.
    joined = (
        df.join(F.broadcast(thresholds), on=keys, how="left")
        if keys
        else df.crossJoin(F.broadcast(thresholds))
    )
    no_thr = F.col(f"__thr{len(fracs) - 1}").isNull()
    bucket = F.when(score.isNull() | no_thr, F.lit(None).cast("string"))
    for i, label in enumerate(labels[:-1]):
        bucket = bucket.when(score <= F.col(f"__thr{i}"), F.lit(label))
    bucket = bucket.otherwise(F.lit(labels[-1]))
    return joined.withColumn("bucket", bucket).drop(
        *[f"__thr{i}" for i in range(len(fracs))]
    )


def top_k_per_group(
    df: DataFrame,
    keys: list[str],
    order_by: list,
    *,
    k: int,
    rank_col: str | None = "rank",
    skew_salt: int | None = None,
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Keep the top ``k`` rows per key group under ``order_by`` (list of
    Columns or column names; wrap with ``F.col(...).desc()`` for
    descending). Include a tie-breaking column to make the cut
    deterministic — ``row_number`` is arbitrary within ties otherwise.

    The standard one-window shape: one shuffle on the keys, per-group
    sort, early filter. Spark's window TopK rewrite (rank-limit pushdown)
    keeps per-partition state at ``k`` rows per group rather than
    sorting whole groups where the optimizer supports it.

    ``skew_salt=S`` (opt-in; decide with ``plans.stats.key_skew_stats``)
    is the IMPLEMENTED hot-key path: a partial top-k per
    ``(keys, salt)`` spreads a dominant key over S window partitions,
    then the final window ranks the ``<= S * k`` survivors per key.
    Any global top-k row ranks <= k inside every subset containing it,
    so when ``order_by`` is a total order (tie-break included, as the
    determinism contract already requires) the two-phase result is
    IDENTICAL to the single-window result. The salt hashes ``salt_on``
    (default: the plain-string entries of ``order_by`` — direction
    wrappers like ``.desc()`` cannot be hashed); pick high-cardinality
    columns (the tie-break id is ideal) so a hot key spreads evenly.

    ``rank_col=None`` drops the rank from the output.
    """
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    from pyspark.sql import Window

    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    out = df
    if skew_salt is not None:
        if skew_salt <= 1:
            raise ValueError(f"skew_salt must be > 1: {skew_salt}")
        salt_cols = salt_on or [c for c in order_by if isinstance(c, str)]
        if not salt_cols:
            raise ValueError(
                "skew_salt needs hashable salt columns: pass salt_on=[...] "
                "when every order_by entry carries a sort direction"
            )
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in salt_cols]),
            F.lit(int(skew_salt)),
        )
        w1 = Window.partitionBy(*keys, salt).orderBy(*cols)
        out = (
            out.withColumn("__rn", F.row_number().over(w1))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
        )
    w = Window.partitionBy(*keys).orderBy(*cols)
    ranked = out.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    if rank_col is None:
        return ranked.drop("__rn")
    return ranked.withColumnRenamed("__rn", rank_col)


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    *,
    n: int = 2,
    num_buckets: int = 10_000,
    alpha: float = 1.0,
) -> DataFrame:
    """DSIR-style hashed n-gram importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    score each RAW document by how target-like its hashed n-gram profile
    is, ``log w(x) = sum_g ln(p_target(b(g)) / p_raw(b(g)))`` with
    ``b(g)`` an md5-derived bucket (``token_hash60 % num_buckets`` — the
    same cross-engine hash the MinHash oracles replay in SQL) and
    add-``alpha`` smoothed bucket frequencies.

    Select by importance: rank on ``log_weight`` (deterministic, e.g.
    :func:`keep_top_fraction`) or sample with Gumbel noise for the
    paper's resampling semantics.

    Scale shape: ONE scan per corpus. The raw side reduces to per-doc
    bucket counts (one partial-agg shuffle); the per-bucket totals, the
    corpus total, and the scoring pass all branch ABOVE that shuffle,
    so Spark's exchange reuse evaluates the raw scan+explode exactly
    once (plan-pinned: a single raw scan + ReusedExchange). Likewise
    the target total derives from the target's bucket counts. The
    per-bucket log-ratio table is tiny and BROADCAST back onto the raw
    side's per-doc counts, so scoring is map-side. Raw docs with at
    least one token get a row; ``n_grams`` counts the multiset.

    Returns ``(id_col, n_grams, log_weight)``.
    """
    from polars_nexpresso_spark.functions.text import (
        token_hash60,
        word_ngrams_all,
    )

    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be positive: {num_buckets}")
    if alpha <= 0:
        raise ValueError(f"alpha must be positive: {alpha}")

    def bucketed(df: DataFrame, keep_id: bool) -> DataFrame:
        cols = [F.col(id_col)] if keep_id else []
        return df.select(
            *cols,
            F.explode(word_ngrams_all(F.col(text_col), n)).alias("__g"),
        ).select(
            *([F.col(id_col)] if keep_id else []),
            F.pmod(token_hash60(F.col("__g")), F.lit(num_buckets)).alias(
                "__b"
            ),
        )

    # Per-doc bucket counts are the ONLY aggregation that touches the
    # raw corpus; everything downstream (per-bucket totals, the corpus
    # total, the scoring join) re-aggregates this table, branching above
    # its shuffle so exchange reuse keeps it a single scan.
    raw_doc = (
        bucketed(raw, keep_id=True)
        .groupBy(id_col, "__b")
        .agg(F.count("*").alias("__c"))
    )
    tgt_b = bucketed(target, keep_id=False)

    p_counts = tgt_b.groupBy("__b").agg(F.count("*").alias("__ct"))
    q_counts = raw_doc.groupBy("__b").agg(F.sum("__c").alias("__cr"))
    nt = p_counts.agg(F.sum("__ct").alias("__nt"))
    nr = q_counts.agg(F.sum("__cr").alias("__nr"))
    # Buckets unseen on one side still get that side's smoothed mass:
    # full-outer join the two <= num_buckets-row count tables, attach the
    # scalar totals via broadcast 1-row frames (the repo's established
    # pattern — no unpartitioned window).
    ratio = (
        p_counts.join(q_counts, on="__b", how="full_outer")
        .withColumn("__ct", F.coalesce("__ct", F.lit(0)))
        .withColumn("__cr", F.coalesce("__cr", F.lit(0)))
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(nr))
    )
    smooth = float(alpha) * num_buckets
    log_ratio = (
        F.log((F.col("__ct") + F.lit(float(alpha)))
              / (F.col("__nt") + F.lit(smooth)))
        - F.log((F.col("__cr") + F.lit(float(alpha)))
                / (F.col("__nr") + F.lit(smooth)))
    )
    bucket_table = ratio.select("__b", log_ratio.alias("__lr"))
    return (
        raw_doc.join(F.broadcast(bucket_table), on="__b", how="left")
        .groupBy(id_col)
        .agg(
            F.sum("__c").alias("n_grams"),
            F.round(F.sum(F.col("__lr") * F.col("__c")), 6).alias(
                "log_weight"
            ),
        )
    )


def gumbel_topk(
    df: DataFrame,
    score_col: str,
    id_col: str,
    *,
    k: int,
    seed: int = 42,
    temperature: float = 1.0,
) -> DataFrame:
    """Sample ``k`` rows WITHOUT replacement with probability proportional
    to ``exp(score / temperature)`` — the Gumbel-top-k trick, closing the
    DSIR loop (:func:`dsir_log_weights` produces the log-weights; the
    paper resamples by them rather than hard-ranking).

    The Gumbel noise is DETERMINISTIC: ``u = (hash_bucket(id, seed) +
    0.5) / denom`` and ``g = -ln(-ln(u))`` — a pure md5 expression, so
    the sample is reproducible across runs, partitionings, and engines
    (same property as :func:`hash_split`; a DuckDB oracle replays it
    bit-for-bit). Changing ``seed`` re-deals the noise.

    Selection is ``TakeOrdered``-shaped via one global top-k (no window,
    no full sort): adds a ``gumbel_key`` column and keeps the k largest
    ``score/temperature + g`` with id as the deterministic tie-break.
    """
    if k <= 0:
        raise ValueError(f"k must be positive: {k}")
    if temperature <= 0:
        raise ValueError(f"temperature must be positive: {temperature}")
    u = (hash_bucket(F.col(id_col), seed) + F.lit(0.5)) / F.lit(
        float(_DENOM)
    )
    key = F.round(
        F.col(score_col) / F.lit(float(temperature)) - F.log(-F.log(u)), 6
    )
    with_key = df.withColumn("gumbel_key", key)
    # limit() after orderBy plans as TakeOrdered (per-partition partial
    # top-k, merge on the driver-side of the exchange) — no global sort.
    return with_key.orderBy(
        F.col("gumbel_key").desc(), F.col(id_col).asc()
    ).limit(k)


def take_token_budget(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    *,
    budget: int,
    seed: int = 42,
    n_buckets: int = 1024,
) -> DataFrame:
    """Deterministically fill a TOKEN budget: order documents by their
    md5 hash (the same ``(seed, id)`` family as :func:`hash_split` —
    an unbiased, reproducible shuffle order) and keep the maximal
    prefix whose inclusive cumulative token count stays within
    ``budget``. "Give me exactly ~1T tokens of this corpus, the same
    ones every run" is the training-set sizing primitive; changing
    ``seed`` re-deals.

    Scale shape: a global running sum normally means ONE unpartitioned
    window over the whole corpus — a single-task sort. Here it is split
    two-level: the 60-bit hash's HIGH bits give an order-consistent
    bucket, per-bucket token sums (``n_buckets`` rows) get an
    unpartitioned-but-bounded prefix window (<= ``n_buckets`` rows by
    construction — the vocab_topk/source_mix justification), and each
    row's global cumulative = its bucket's exclusive prefix (broadcast
    back) + an in-bucket partitioned running window. No full-corpus
    single-task sort anywhere.

    Returns ``(id_col, n_tokens, cum_tokens)`` for the selected docs;
    join back on ``id_col`` for payloads.
    """
    from pyspark.sql.window import Window

    from polars_nexpresso_spark.functions.text import token_count

    if budget < 0:
        raise ValueError(f"budget must be >= 0: {budget}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1: {n_buckets}")
    # Raw 60-bit key (NOT modded — the high bits must stay
    # order-consistent so bucket order == hash order).
    h_hex = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    )
    h60 = F.conv(F.substring(h_hex, 1, 15), 16, 10).cast("bigint")
    width = (1 << 60) // n_buckets
    # Integer `div`, NOT floor(double division): float64 cannot represent
    # every 60-bit hash exactly, so floor(h / width) lands rows one
    # bucket off near boundaries (e.g. h=575334852396580832, width=2^50:
    # 511 vs the true 510), breaking the bucket-order == hash-order
    # invariant the two-level prefix sum depends on.
    base = docs.select(
        F.col(id_col),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        h60.alias("__h"),
    ).withColumn("__b", F.expr(f"__h div {width}L").cast("int"))
    bucket_sums = base.groupBy("__b").agg(
        F.sum("n_tokens").alias("__bsum")
    )
    # Bounded unpartitioned window: <= n_buckets rows by construction.
    wb = (
        Window.orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = bucket_sums.select(
        "__b",
        F.coalesce(F.sum("__bsum").over(wb), F.lit(0)).alias("__before"),
    )
    wr = (
        Window.partitionBy("__b")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        base.join(F.broadcast(prefix), on="__b")
        .withColumn(
            "cum_tokens",
            (F.col("__before") + F.sum("n_tokens").over(wr)).cast("long"),
        )
        .filter(F.col("cum_tokens") <= budget)
        .select(id_col, "n_tokens", "cum_tokens")
    )


def epoch_plan(
    weights: DataFrame,
    *,
    token_budget: int,
    max_epochs: float = 4.0,
    source_col: str = "source",
) -> DataFrame:
    """Turn mixture weights into a per-source EPOCH plan: how many passes
    over each source fill a ``token_budget`` at the target mix — the
    step between choosing proportions (:func:`source_mix_weights` /
    :func:`temperature_mix_weights`) and materializing the corpus
    (:func:`repeat_upsample`). Data-constrained scaling work (Muennighoff
    et al. 2023) caps useful repetition at ~4 epochs: ``max_epochs``
    enforces that ceiling and ``capped`` marks the sources that hit it
    (their budget share is NOT silently reallocated — a short plan is
    visible as ``sum(tokens_planned) < token_budget``, the honest signal
    to either raise the cap or add data).

    ``weights`` is any DataFrame with ``source_col``, ``n_tokens`` and
    ``target_share`` columns — the mixture planners' output schema.
    Budget is allocated by ``target_share`` renormalized over the rows
    present, so a weights table filtered to a subset still plans
    coherently.

    Scale shape: the input is a #sources-row planning table; the
    unbounded window runs at driver-scale cardinality, never over row
    data. Returns ``(source, n_tokens, target_share, target_tokens,
    epochs_raw, epochs, tokens_planned, capped)``.
    """
    from pyspark.sql import Window

    for c in (source_col, "n_tokens", "target_share"):
        if c not in weights.columns:
            raise ValueError(f"weights is missing column {c!r}")
    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive, got {token_budget}")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be positive, got {max_epochs}")
    everything = Window.partitionBy()
    tgt_sum = F.sum("target_share").over(everything)
    target_tokens = (
        F.lit(float(token_budget)) * F.col("target_share") / tgt_sum
    )
    epochs_raw = target_tokens / F.col("n_tokens")
    epochs = F.round(
        F.least(epochs_raw, F.lit(float(max_epochs))), 6
    )
    return weights.select(
        source_col,
        "n_tokens",
        "target_share",
        F.round(target_tokens, 2).alias("target_tokens"),
        F.round(epochs_raw, 6).alias("epochs_raw"),
        epochs.alias("epochs"),
        F.round(epochs * F.col("n_tokens"))
        .cast("bigint")
        .alias("tokens_planned"),
        (epochs_raw > max_epochs).alias("capped"),
    )


def repeat_upsample(
    df: DataFrame,
    id_col: str,
    plan: DataFrame,
    *,
    source_col: str = "source",
    epochs_col: str = "epochs",
    seed: int = 43,
) -> DataFrame:
    """Materialize an epoch plan: replicate each source's rows
    ``epochs`` times — whole copies for the integer part, plus one extra
    copy for a deterministic hash-chosen ``frac`` of ids for the
    fractional part. Each copy carries an ``epoch`` index (1-based), so
    downstream shuffling/packing can keep or interleave epochs.

    WHICH ids get the fractional extra copy is decided by the same
    md5-of-(seed, id) arithmetic as :func:`hash_split` — stable across
    runs, partitionings, and engines, and independent of the hash that
    drives any later split (different seed stream). Sources absent from
    ``plan`` are dropped (the plan IS the keep-list); negative epochs
    clamp to 0.

    Scale shape: the plan is a #sources-row table attached by broadcast
    join — row data never shuffles; the only fan-out is the explode,
    proportional to the tokens actually planned. The 100 TB version is
    this exact plan with more input splits.
    """
    if id_col not in df.columns or source_col not in df.columns:
        raise ValueError(
            f"df must have columns {id_col!r} and {source_col!r}"
        )
    for c in (source_col, epochs_col):
        if c not in plan.columns:
            raise ValueError(f"plan is missing column {c!r}")
    eps = F.greatest(F.col(epochs_col).cast("double"), F.lit(0.0))
    whole = F.floor(eps)
    cut = F.round((eps - whole) * _DENOM).cast("bigint")
    extra = (hash_bucket(F.col(id_col), seed) < cut).cast("bigint")
    n_copies = (whole + extra).alias("__n_copies")
    joined = df.join(
        F.broadcast(plan.select(source_col, epochs_col)),
        on=source_col,
        how="inner",
    ).withColumn("__n_copies", n_copies)
    copies = F.when(
        F.col("__n_copies") >= 1,
        F.sequence(F.lit(1).cast("bigint"), F.col("__n_copies")),
    ).otherwise(F.array().cast("array<bigint>"))
    return joined.withColumn("epoch", F.explode(copies)).drop(
        "__n_copies", epochs_col
    )


def apply_mix_weights(
    df: DataFrame,
    weights: DataFrame,
    id_col: str,
    *,
    source_col: str = "source",
    weight_col: str = "weight",
    seed: int = 44,
) -> DataFrame:
    """Materialize downsample-only mixture weights: keep each source's
    rows with probability ``weight`` — the executor for
    :func:`source_mix_weights` / :func:`temperature_mix_weights`
    (their upsampling counterpart is :func:`repeat_upsample`, same
    broadcast-plan shape, different direction).

    Membership is the md5-of-(seed, id) bucket against the source's
    weight cut — deterministic across runs, partitionings, and engines,
    and drawn from its own seed stream so it is independent of any
    later :func:`hash_split`. The weights table attaches by BROADCAST
    join (#sources rows); sources absent from it drop (the weights
    table IS the keep-list). The weight is quantized to ppm — the same
    resolution every sampler here uses.

    Returns surviving rows, schema unchanged.
    """
    if id_col not in df.columns or source_col not in df.columns:
        raise ValueError(
            f"df must have columns {id_col!r} and {source_col!r}"
        )
    for c in (source_col, weight_col):
        if c not in weights.columns:
            raise ValueError(f"weights is missing column {c!r}")
    cuts = weights.select(
        source_col,
        F.round(F.col(weight_col) * _DENOM).cast("bigint").alias("__cut"),
    )
    bucket = hash_bucket(F.col(id_col), seed)
    return (
        df.withColumn("__bucket", bucket)
        .join(F.broadcast(cuts), on=source_col, how="inner")
        .filter(F.col("__bucket") < F.col("__cut"))
        .drop("__bucket", "__cut")
    )


def curriculum_shards(
    df: DataFrame,
    score_col: str,
    id_col: str,
    *,
    n_stages: int = 3,
    n_shards: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Curriculum sharding: assign every row a training ``stage`` (by
    global score quantiles — e.g. short-to-long length curriculum, or
    easy-to-hard under an LM score), a ``shard`` (by id hash, so each
    stage splits into ``n_shards`` equal loader files), and a ``pos``
    (deterministic read order within the (stage, shard)) — the
    materializable plan a curriculum training loop consumes stage by
    stage, shard-parallel, identically on every rerun.

    Stage thresholds come from :func:`score_buckets` (ONE exact
    percentile aggregation, broadcast back, map-side CASE labeling —
    rows with NULL scores get a NULL stage and sort into their own
    partition rather than silently dropping). Shard and position use
    two INDEPENDENT members of the md5 ``(seed, id)`` hash family
    (``seed`` for the shard, ``seed + 1`` for the in-shard order), so
    position within a shard is uncorrelated with shard election; both
    are layout- and engine-independent, replayable in plain SQL.

    Scale shape: one threshold aggregation + one window shuffle
    partitioned by ``(stage, shard)`` — ``n_stages × n_shards`` window
    partitions, so size ``n_shards`` to the cluster (hundreds+ at
    100 TB keeps every reducer busy and every output file loader-sized).

    Returns the input columns plus ``(stage, shard, pos)``.
    """
    from pyspark.sql.window import Window

    if n_stages < 2:
        raise ValueError(f"n_stages must be >= 2: {n_stages}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1: {n_shards}")
    if score_col not in df.columns or id_col not in df.columns:
        raise ValueError(
            f"columns {score_col!r}/{id_col!r} not both in {df.columns}"
        )
    fracs = tuple(i / n_stages for i in range(1, n_stages))
    labels = tuple(f"stage{i}" for i in range(n_stages))
    staged = score_buckets(
        df, score_col, fracs=fracs, labels=labels
    ).withColumnRenamed("bucket", "stage")
    shard = (hash_bucket(F.col(id_col), seed) % F.lit(int(n_shards))).cast(
        "int"
    )
    order_hash = hash_bucket(F.col(id_col), seed + 1)
    w = Window.partitionBy("stage", "shard").orderBy(
        order_hash.asc(), F.col(id_col).asc()
    )
    return (
        staged.withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
    )
