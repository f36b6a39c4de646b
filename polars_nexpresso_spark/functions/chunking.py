"""Token-window document chunking for context-length-bounded training.

The standard preprocessing step between raw documents and sequence
packing: split each document into fixed-size token windows with overlap
(RAG indexing, long-document training, embedding-model input prep all
use this shape). Pure Spark Column expressions — the tokenization, the
window arithmetic, and the slicing all run JVM-side inside whole-stage
codegen, and the only plan node added over the scan is one ``explode``
(no shuffle, no Python). At 100 TB the operator is embarrassingly
parallel: output size ~ ``n_tokens / stride`` rows per document, each
partition chunks independently.

No reference counterpart (the reference engine has no text surface);
this is brief-scope pipeline tooling alongside ``seqpack`` — chunking
bounds the UNIT length, packing fills fixed-length training rows from
the units.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from polars_nexpresso_spark.functions.text import tokens


def chunk_spans(toks: Column, chunk_size: int, stride: int) -> Column:
    """Array of ``(chunk_id, chunk_tokens)`` structs for a token array.

    Window ``i`` covers tokens ``[i*stride, i*stride + chunk_size)``
    (0-based); the last window may be shorter, and a document shorter
    than ``chunk_size`` yields exactly one window. Empty/NULL token
    arrays yield an empty span array. Integer arithmetic only, so the
    DuckDB oracle reproduces the window count exactly:
    ``n_chunks = (n - chunk_size + stride - 1) div stride + 1``.
    """
    # ``toks`` should be a PLAIN COLUMN REFERENCE staged by the caller
    # (chunk_documents stages tokens(text) in its own projection): a
    # full expression here would re-run once per window inside the
    # lambda — O(len²) per row, the hof_reeval_risks rake. (A let_bound
    # wrapper is NOT the fix: its nested lambda breaks ExtractPythonUDFs
    # for any downstream pandas-UDF consumer — see word_ngrams_all.)
    n = F.size(toks)
    n_chunks = (
        F.when(n <= 0, F.lit(0).cast("long"))
        .when(n <= chunk_size, F.lit(1).cast("long"))
        .otherwise(
            F.floor(
                (n - F.lit(chunk_size) + F.lit(stride - 1)).cast("double")
                / F.lit(stride)
            ).cast("long")
            + F.lit(1)
        )
    )
    # Guard the sequence: Spark's sequence(0, -1) counts DOWN (step
    # defaults to -1 when start > stop), so an empty document must short-
    # circuit to an empty array instead.
    ids = F.when(
        n_chunks > 0, F.sequence(F.lit(0).cast("long"), n_chunks - 1)
    ).otherwise(F.array().cast("array<bigint>"))
    return F.transform(
        ids,
        lambda i: F.struct(
            i.alias("chunk_id"),
            F.slice(
                toks, (i * stride + 1).cast("int"), chunk_size
            ).alias("chunk_tokens"),
        ),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Explode documents into overlapping token-window chunks.

    Returns ``(id, chunk_id, n_chunk_tokens, chunk_text)`` with one row
    per window; ``chunk_text`` re-joins the window's tokens with single
    spaces (the same normalized-whitespace form every other text
    operator tokenizes from, so chunk output feeds straight back into
    dedup / scoring / packing).

    ``overlap`` must satisfy ``0 <= overlap < chunk_size``; the stride
    between window starts is ``chunk_size - overlap``.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError(
            f"need 0 <= overlap < chunk_size, got overlap={overlap} "
            f"chunk_size={chunk_size}"
        )
    stride = chunk_size - overlap
    # Stage the token array as a REAL column first: chunk_spans's window
    # lambda references it per window, so a full tokens(text) expression
    # there would re-tokenize once per window (O(len²) per row).
    staged = df.select(
        F.col(id_col).alias("__id"),
        tokens(F.col(text_col)).alias("__toks"),
    )
    spans = chunk_spans(F.col("__toks"), chunk_size, stride)
    return (
        staged.select(F.col("__id"), F.explode(spans).alias("__c"))
        .select(
            F.col("__id").alias(id_col),
            F.col("__c.chunk_id").alias("chunk_id"),
            F.size("__c.chunk_tokens").cast("bigint").alias("n_chunk_tokens"),
            F.array_join("__c.chunk_tokens", " ").alias("chunk_text"),
        )
    )
