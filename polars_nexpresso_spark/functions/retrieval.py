"""BM25 ranked retrieval over a document corpus.

The keyword-search counterpart of the embedding top-k family in
``similarity.py``: score every document against a query string with the
Okapi BM25 formula and return the top-``k``. The classic use in a
training-data pipeline is targeted corpus inspection ("show me the
documents about X") and retrieval-based eval-set construction.

Scale shape (100 TB):
- the per-document term explode is FILTERED to the query's terms
  immediately (``isin`` on a literal list) — the shuffle that follows
  carries only (doc, query-term) hits, a tiny fraction of the corpus;
- document frequencies are aggregated over that filtered table (at most
  ``|query terms|`` rows survive) and broadcast back;
- corpus stats (N, avgdl) are one scalar aggregate attached via
  broadcast cross join — the same pattern as ``tfidf_keywords``'s
  document count;
- the final top-k is ``orderBy().limit(k)``, which Spark executes as
  TakeOrdered (per-partition heap + driver merge of k·partitions rows,
  no full sort shuffle).

Everything is expression-level (no Python UDFs); scores round to 6 dp so
the DuckDB oracle matches hash-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from polars_nexpresso_spark.functions.text import tokens


def bm25_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query: str,
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents for ``query`` under Okapi BM25.

    ``score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))``
    with the Lucene-style non-negative idf
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``. Duplicate query terms count
    once (a bag-of-words query scores each distinct term once, the
    standard formulation).

    Returns ``(id, score)`` ordered by score descending, id ascending
    (deterministic tie-break), at most ``k`` rows.
    """
    q_terms = sorted(set(query.lower().split()))
    if not q_terms:
        raise ValueError("query has no terms")

    docs = df.select(
        F.col(id_col).alias("__id"), tokens(F.col(text_col)).alias("__toks")
    )
    # Per-doc length must come BEFORE the term filter (dl counts all
    # tokens, not just query-term hits).
    doc_len = docs.select("__id", F.size("__toks").alias("__dl"))
    stats = doc_len.agg(
        F.count("*").alias("__N"), F.avg("__dl").alias("__avgdl")
    )

    hits = (
        docs.select("__id", F.explode("__toks").alias("__t"))
        .filter(F.col("__t").isin(q_terms))
        .groupBy("__id", "__t")
        .agg(F.count("*").alias("__tf"))
    )
    dfreq = hits.groupBy("__t").agg(F.count("*").alias("__df"))

    scored = (
        hits.join(doc_len, on="__id")
        .join(F.broadcast(dfreq), on="__t")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "__idf",
            F.log(
                F.lit(1.0)
                + (F.col("__N") - F.col("__df") + F.lit(0.5))
                / (F.col("__df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "__s",
            F.col("__idf")
            * (F.col("__tf") * F.lit(k1 + 1.0))
            / (
                F.col("__tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("__dl") / F.col("__avgdl")
                )
            ),
        )
    )
    return (
        scored.groupBy("__id")
        .agg(F.round(F.sum("__s"), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("__id").asc())
        .limit(k)
        .select(F.col("__id").alias(id_col), "score")
    )
