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
