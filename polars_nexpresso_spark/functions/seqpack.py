"""Sequence packing: assign documents to fixed-token-budget training
sequences (the "sample packing" step of an LLM data pipeline).

Greedy first-fit-in-order packing: walk the documents of a shard in id
order, accumulate token counts, and start a new sequence whenever the next
document would overflow ``budget``. A document larger than the budget gets
a sequence of its own (no truncation here — that is the trainer's call).

Scale design (100 TB): a GLOBAL greedy pack is inherently sequential, and
also pointless — training shards are independent, so packing only needs to
be greedy *within* a shard. Documents are hash-sharded by the same
md5-derived bucket arithmetic as :mod:`sampling` (deterministic,
engine-reproducible, no RNG), so the pack is embarrassingly parallel
across shards: one shuffle to co-locate each shard, then a per-shard
linear walk inside ``applyInPandas`` (numpy-backed loop over an Arrow
batch). Shard count is the parallelism dial — at 100 TB you size shards to
the 10⁵-document range so every executor walks its shards locally.

The assignment is fully deterministic given (ids, token counts, budget,
num_shards, seed) — the DuckDB oracle replays the same walk with a
recursive CTE (`pipeline_queries.py`, ``sequence_pack``).

No reference analog (the reference has no token/packing surface,
SURVEY.md §2.F); this is a training-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_nexpresso_spark.functions.sampling import hash_bucket


def sequence_pack(
    df: DataFrame,
    token_col: str,
    id_col: str,
    *,
    budget: int,
    num_shards: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Assign every row a ``(shard, seq_id)`` training-sequence slot.

    ``token_col`` is the per-document token count (compute it upstream,
    e.g. ``text.token_count``); ``id_col`` orders the greedy walk within a
    shard and must be unique. Output adds three columns: ``shard``,
    ``seq_id`` (0-based per shard), and ``seq_fill`` (cumulative tokens of
    the sequence *after* placing this row — the trainer's offset).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if num_shards <= 0:
        raise ValueError(f"num_shards must be positive, got {num_shards}")

    import pandas as pd

    out_fields = df.schema.fields
    out_ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in out_fields
    ) + ", `shard` int, `seq_id` bigint, `seq_fill` bigint"

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        toks = pdf[token_col].to_numpy()
        seq_ids = []
        fills = []
        seq = 0
        fill = 0
        for t in toks:
            t = int(t)
            if fill > 0 and fill + t > budget:
                seq += 1
                fill = 0
            fill += t
            seq_ids.append(seq)
            fills.append(fill)
        pdf["seq_id"] = pd.Series(seq_ids, dtype="int64")
        pdf["seq_fill"] = pd.Series(fills, dtype="int64")
        return pdf

    sharded = df.withColumn(
        "shard", (hash_bucket(F.col(id_col), seed) % num_shards).cast("int")
    )
    return sharded.groupBy("shard").applyInPandas(pack_shard, out_ddl)
