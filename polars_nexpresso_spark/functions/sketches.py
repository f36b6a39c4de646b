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
