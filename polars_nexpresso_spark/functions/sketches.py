"""Mergeable distinct-count sketches for incremental corpus accounting.

At 100 TB, "how many distinct documents/urls/fingerprints per
(source, lang, day)" cannot be recomputed from scratch per report.
The scalable pattern is a SKETCH TABLE: each ingest increment reduces
to one small row per group holding a mergeable HLL sketch (Apache
DataSketches, built into Spark 3.5+ as ``hll_sketch_agg`` /
``hll_union_agg``); reports union the per-increment sketches — bytes
proportional to groups, never to rows — and estimate at the end.
Union is lossless for same-``lg_k`` sketches, so incremental ==
one-shot to the sketch's own precision (~1.6%/sqrt(2^lg_k) relative
standard error; lg_k=12 ≈ 0.8%).

Exact distincts stay available everywhere else in this repo
(``corpus_report`` documents the swap); this module is the incremental
path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sketch_distinct(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    *,
    lg_k: int = 12,
    sketch_col: str = "sketch",
    estimate_col: str | None = "approx_distinct",
) -> DataFrame:
    """Reduce to one row per ``keys`` group holding an HLL sketch of the
    distinct ``value_col`` values (plus its estimate unless
    ``estimate_col=None``). One partial-agg shuffle; the sketch buffer
    is ~``2^lg_k`` bytes per group regardless of row count.

    Persist the output per increment; combine increments with
    :func:`merge_sketches`.
    """
    if not 4 <= lg_k <= 21:
        raise ValueError(f"lg_k must be in [4, 21]: {lg_k}")
    agg = df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias(sketch_col)
    )
    if estimate_col is None:
        return agg
    return agg.withColumn(
        estimate_col, F.hll_sketch_estimate(F.col(sketch_col))
    )


def merge_sketches(
    df: DataFrame,
    keys: list[str],
    *,
    sketch_col: str = "sketch",
    estimate_col: str | None = "approx_distinct",
    allow_different_lg_k: bool = False,
) -> DataFrame:
    """Union per-increment sketch rows down to one sketch per ``keys``
    group (lossless for same-``lg_k`` sketches) and re-estimate.

    ``allow_different_lg_k=True`` permits unioning sketches built at
    different precisions (the result downgrades to the coarsest) —
    keep it off so a mis-configured increment fails loudly instead of
    silently degrading every report that touches it.
    """
    agg = df.groupBy(*keys).agg(
        F.hll_union_agg(
            F.col(sketch_col), F.lit(bool(allow_different_lg_k))
        ).alias(sketch_col)
    )
    if estimate_col is None:
        return agg
    return agg.withColumn(
        estimate_col, F.hll_sketch_estimate(F.col(sketch_col))
    )


# --- count-min frequency sketches -------------------------------------------
#
# The frequency counterpart of the HLL section: "how often does token /
# url / fingerprint X occur per (source, day)" as a mergeable sketch
# table. Spark's `count_min_sketch` aggregate produces the sketch
# (eps-width, confidence-depth CMS; estimate >= truth, overshoot
# <= eps * total with prob. confidence); increments merge by elementwise
# table addition, which we do INSIDE Spark via applyInPandas on the
# serialized form (same-seed sketches share hash functions, so merge is
# exact — merged bytes == the one-shot sketch of the concatenated data).
# Probing has no SQL builtin, so `cms_estimate` replays the OSS bucket
# math (Murmur3_x86_32 double hashing over UTF-8 bytes — the
# Spark/Guava scheme) on the driver for a bounded candidate list.

_CMS_C1 = 0xCC9E2D51
_CMS_C2 = 0x1B873593


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _CMS_C1) & 0xFFFFFFFF
    k1 = ((k1 << 15) | (k1 >> 17)) & 0xFFFFFFFF
    return (k1 * _CMS_C2) & 0xFFFFFFFF


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = ((h1 << 13) | (h1 >> 19)) & 0xFFFFFFFF
    return (h1 * 5 + 0xE6546B64) & 0xFFFFFFFF


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & 0xFFFFFFFF
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & 0xFFFFFFFF
    return h1 ^ (h1 >> 16)


def _murmur3_bytes(data: bytes, seed: int) -> int:
    """Murmur3_x86_32 in the JVM's unsafe-bytes variant: 4-byte
    little-endian words, then each TAIL byte sign-extended and mixed as
    its own word (unlike standard murmur3's accumulated tail)."""
    h1 = seed & 0xFFFFFFFF
    aligned = len(data) - len(data) % 4
    for i in range(0, aligned, 4):
        word = int.from_bytes(data[i : i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(word))
    for i in range(aligned, len(data)):
        b = data[i]
        word = b | 0xFFFFFF00 if b >= 0x80 else b  # sign-extend
        h1 = _mix_h1(h1, _mix_k1(word))
    return _fmix(h1, len(data))


def _cms_buckets(item: str, depth: int, width: int) -> list[int]:
    data = item.encode("utf-8")
    h1 = _murmur3_bytes(data, 0)
    h2 = _murmur3_bytes(data, h1)
    out = []
    for i in range(depth):
        combined = (h1 + i * h2) & 0xFFFFFFFF
        if combined >= 1 << 31:  # back to signed 32-bit
            combined -= 1 << 32
        rem = combined - int(combined / width) * width  # Java trunc %
        out.append(abs(rem))
    return out


def _cms_parse(blob: bytes):
    """(total, depth, width, hash_seeds, table) from Spark's serialized
    CMS (big-endian: version, totalCount, depth, width, hashA, rows)."""
    import struct

    import numpy as np

    version = struct.unpack_from(">i", blob, 0)[0]
    if version != 1:
        raise ValueError(f"unsupported count-min sketch version {version}")
    total = struct.unpack_from(">q", blob, 4)[0]
    depth, width = struct.unpack_from(">ii", blob, 12)
    off = 20
    hash_a = np.frombuffer(blob, dtype=">i8", count=depth, offset=off)
    off += depth * 8
    table = np.frombuffer(
        blob, dtype=">i8", count=depth * width, offset=off
    ).reshape(depth, width)
    return total, depth, width, hash_a, table


def _cms_serialize(total, depth, width, hash_a, table) -> bytes:
    import struct

    return (
        struct.pack(">iqii", 1, int(total), int(depth), int(width))
        + hash_a.astype(">i8").tobytes()
        + table.astype(">i8").tobytes()
    )


def sketch_frequencies(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    *,
    eps: float = 0.0001,
    confidence: float = 0.99,
    seed: int = 42,
    sketch_col: str = "cms",
) -> DataFrame:
    """Reduce to one row per ``keys`` group holding a count-min sketch
    of ``value_col`` occurrence counts. One partial-agg shuffle; the
    sketch is ~``ceil(2/eps) * ceil(log2(1/(1-confidence))) * 8`` bytes
    per group regardless of row count (defaults: ~2.8 MB — sized for
    token-frequency accounting where overshoot must stay under
    eps=1e-4 of the group's token volume).

    Values are sketched AS STRINGS (the column is cast) so the driver
    probe's byte-level hash replay applies to every input type. Keep
    ``seed`` fixed across increments you intend to merge.
    """
    if not 0 < eps < 1 or not 0 < confidence < 1:
        raise ValueError(
            f"eps and confidence must be in (0, 1): {eps}, {confidence}"
        )
    return df.groupBy(*keys).agg(
        F.count_min_sketch(
            F.col(value_col).cast("string"),
            F.lit(float(eps)),
            F.lit(float(confidence)),
            F.lit(int(seed)),
        ).alias(sketch_col)
    )


def merge_frequency_sketches(
    df: DataFrame,
    keys: list[str],
    *,
    sketch_col: str = "cms",
) -> DataFrame:
    """Union per-increment CMS rows to one sketch per ``keys`` group —
    elementwise table addition on the serialized form, exact for
    same-seed sketches (merged == one-shot over the concatenated data,
    byte for byte). Runs INSIDE Spark (``applyInPandas`` keyed on the
    group), so the shuffle carries one sketch blob per increment-group,
    never row data. Mixed-geometry or mixed-seed sketches fail fast.
    """
    import pandas as pd

    fields = ", ".join(f"{k} string" for k in keys)
    schema = f"{fields}, {sketch_col} binary"
    out_cols = [*keys, sketch_col]

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        blobs = list(pdf[sketch_col])
        total, depth, width, hash_a, table = _cms_parse(blobs[0])
        table = table.copy()
        for blob in blobs[1:]:
            t2, d2, w2, h2, tab2 = _cms_parse(blob)
            if d2 != depth or w2 != width or not (h2 == hash_a).all():
                raise ValueError(
                    "cannot merge count-min sketches with different "
                    "geometry or seed"
                )
            total += t2
            table += tab2
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row[sketch_col] = [
            _cms_serialize(total, depth, width, hash_a, table)
        ]
        return pd.DataFrame(row)

    return (
        df.select(
            *[F.col(k).cast("string").alias(k) for k in keys], sketch_col
        )
        .groupBy(*keys)
        .applyInPandas(merge, schema=schema)
        .select(*out_cols)
    )


def cms_estimate(blob: bytes, items: list) -> dict:
    """Estimated occurrence counts for ``items`` from one serialized
    sketch — the bounded-candidate probe (candidates come from a
    sample / per-increment exact top-k; the sketch then gives every
    candidate a count consistent across the whole merged corpus).
    Estimates are upper-biased: ``true <= est <= true + eps * total``
    with the sketch's confidence."""
    total, depth, width, hash_a, table = _cms_parse(blob)
    out = {}
    for item in items:
        s = item if isinstance(item, str) else str(item)
        buckets = _cms_buckets(s, depth, width)
        out[item] = int(
            min(table[i][b] for i, b in enumerate(buckets))
        )
    return out


# --- histogram quantile sketches ---------------------------------------------
#
# The quantile counterpart of the HLL/CMS sections: "p50/p95/p99 of
# quality score / doc length per (source, day)" as a mergeable sketch
# table. A fixed-boundary histogram over a declared [lo, hi) range:
# deterministic (merged == one-shot, field for field — no sampling
# state, unlike t-digest/KLL), mergeable in PURE Spark expressions
# (elementwise count-array addition — no Python anywhere), and with a
# hard error bound: an in-range quantile estimate is within one bin
# width of the truth. The declared range is the honest trade: right for
# known-scale signals (scores in [0,1], lengths in [0, cap]); mass
# outside the range is tracked exactly in n_below/n_above plus the true
# min/max, so a mis-declared range is VISIBLE in the sketch rather than
# silently clipped. Exact percentiles stay available in
# `keep_top_fraction`/`quality_percentiles`; this is the incremental
# path.


def sketch_quantiles(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    *,
    lo: float,
    hi: float,
    num_bins: int = 256,
    sketch_col: str = "qsketch",
) -> DataFrame:
    """Reduce to one row per ``keys`` group holding a histogram
    quantile sketch of ``value_col``: a struct
    ``(lo, hi, num_bins, n, n_below, n_above, vmin, vmax, counts)``.
    Two partial-agg shuffles ((keys × bin) then keys); the sketch is
    ``num_bins`` longs per group regardless of row count. NULL values
    are not sketched. Keep the geometry fixed across increments you
    intend to merge."""
    if not lo < hi:
        raise ValueError(f"need lo < hi: {lo}, {hi}")
    if num_bins < 2:
        raise ValueError(f"num_bins must be >= 2: {num_bins}")
    v = F.col(value_col).cast("double")
    width = (float(hi) - float(lo)) / num_bins
    bin_expr = (
        F.when(v < float(lo), F.lit(-1))
        .when(v >= float(hi), F.lit(num_bins))
        .otherwise(F.floor((v - float(lo)) / F.lit(width)).cast("int"))
    )
    per_bin = (
        df.filter(v.isNotNull())
        .select(*keys, bin_expr.alias("__b"), v.alias("__v"))
        .groupBy(*keys, "__b")
        .agg(
            F.count("*").alias("__c"),
            F.min("__v").alias("__mn"),
            F.max("__v").alias("__mx"),
        )
    )
    in_range = F.when(
        (F.col("__b") >= 0) & (F.col("__b") < num_bins),
        F.struct(F.col("__b"), F.col("__c")),
    )
    bin_map = F.map_from_entries(
        F.filter(F.collect_list(in_range), lambda s: s.isNotNull())
    )
    counts = F.transform(
        F.sequence(F.lit(0), F.lit(num_bins - 1)),
        lambda i: F.coalesce(
            F.element_at(bin_map, i.cast("int")), F.lit(0).cast("long")
        ),
    )
    return per_bin.groupBy(*keys).agg(
        F.struct(
            F.lit(float(lo)).alias("lo"),
            F.lit(float(hi)).alias("hi"),
            F.lit(num_bins).alias("num_bins"),
            F.sum("__c").alias("n"),
            F.coalesce(
                F.sum(F.when(F.col("__b") == -1, F.col("__c"))),
                F.lit(0),
            ).cast("long").alias("n_below"),
            F.coalesce(
                F.sum(F.when(F.col("__b") == num_bins, F.col("__c"))),
                F.lit(0),
            ).cast("long").alias("n_above"),
            F.min("__mn").alias("vmin"),
            F.max("__mx").alias("vmax"),
            counts.alias("counts"),
        ).alias(sketch_col)
    )


def merge_quantile_sketches(
    df: DataFrame,
    keys: list[str],
    *,
    sketch_col: str = "qsketch",
) -> DataFrame:
    """Union per-increment quantile-sketch rows to one sketch per
    ``keys`` group — scalar fields re-aggregate, count arrays add
    elementwise via ``aggregate``/``zip_with`` (pure JVM expressions,
    no Python), so merged == one-shot field for field. Mixed-geometry
    increments fail loudly (``raise_error``), the same contract as the
    CMS/HLL mergers."""
    s = sketch_col
    cl = F.collect_list(F.col(f"{s}.counts"))
    summed = F.aggregate(
        cl,
        F.transform(F.element_at(cl, 1), lambda _: F.lit(0).cast("long")),
        lambda acc, arr: F.zip_with(acc, arr, lambda a, b: a + b),
    )
    geom = F.count_distinct(
        F.struct(
            F.col(f"{s}.lo"), F.col(f"{s}.hi"), F.col(f"{s}.num_bins")
        )
    )
    return df.groupBy(*keys).agg(
        F.struct(
            F.when(
                geom > 1,
                F.raise_error(
                    "cannot merge quantile sketches with different "
                    "geometry"
                ).cast("double"),
            ).otherwise(F.first(f"{s}.lo")).alias("lo"),
            F.first(f"{s}.hi").alias("hi"),
            F.first(f"{s}.num_bins").alias("num_bins"),
            F.sum(f"{s}.n").alias("n"),
            F.sum(f"{s}.n_below").alias("n_below"),
            F.sum(f"{s}.n_above").alias("n_above"),
            F.min(f"{s}.vmin").alias("vmin"),
            F.max(f"{s}.vmax").alias("vmax"),
            summed.alias("counts"),
        ).alias(s)
    )


def quantile_estimate(sketch, qs: list[float]) -> dict[float, float]:
    """Quantile estimates from one sketch row (a Row or dict with the
    sketch struct's fields) — linear interpolation inside the owning
    bin, clamped to the observed [vmin, vmax]. For values inside the
    declared range the estimate is within ONE BIN WIDTH of the exact
    quantile; ranks falling into the out-of-range mass return the
    observed vmin/vmax (the sketch's only information there)."""
    lo, hi = float(sketch["lo"]), float(sketch["hi"])
    counts = list(sketch["counts"])
    num_bins = int(sketch["num_bins"])
    n = int(sketch["n"])
    n_below = int(sketch["n_below"])
    vmin, vmax = float(sketch["vmin"]), float(sketch["vmax"])
    width = (hi - lo) / num_bins
    out: dict[float, float] = {}
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile must be in [0, 1]: {q}")
        if n == 0:
            out[q] = float("nan")
            continue
        rank = q * n
        if rank <= n_below:
            out[q] = vmin
            continue
        acc = float(n_below)
        est = vmax
        for i, c in enumerate(counts):
            if acc + c >= rank and c > 0:
                est = lo + (i + (rank - acc) / c) * width
                break
            acc += c
        out[q] = min(max(est, vmin), vmax)
    return out
