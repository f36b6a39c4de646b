"""PII detection and redaction for training-corpus sanitization.

Scrubbing emails / phone numbers / IP addresses / SSN-shaped ids is a
standard pre-training compliance pass. Implemented as a fixed, ORDERED
chain of ``regexp_replace`` expressions — pure map-side, no shuffle, no
Python, fully streaming-safe (works identically under ``readStream``).

Pattern syntax is restricted to the intersection of Java regex (Spark)
and RE2 (DuckDB): character classes, bounded repetition, ``\\b`` word
boundaries — no lookarounds, no backreferences — so the DuckDB oracle
exercises the SAME patterns and the redaction output is hash-exact
across engines.

Order matters and is part of the contract: emails are redacted before
IPs (an email's dotted local/domain parts must not be half-eaten as an
IP), and SSN-shaped ids before phone numbers (disjoint groupings today,
but the order makes the composition deterministic if patterns evolve).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — applied in list order.
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    (
        "ipv4",
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "<IP>",
    ),
    (
        "ssn",
        r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
        "<SSN>",
    ),
    (
        "phone",
        r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b",
        "<PHONE>",
    ),
]


def redact_text(col: Column) -> Column:
    """The redacted form of ``col`` under :data:`PII_PATTERNS`."""
    out = col
    for _, pattern, replacement in PII_PATTERNS:
        out = F.regexp_replace(out, pattern, replacement)
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-type match counts, measured on the SAME intermediate text the
    redaction chain sees (count after the prior replacements, so an
    email's digits are never double-counted as a phone number)."""
    counts: dict[str, Column] = {}
    cur = col
    for name, pattern, replacement in PII_PATTERNS:
        counts[name] = F.regexp_count(cur, F.lit(pattern))
        cur = F.regexp_replace(cur, pattern, replacement)
    return counts


def redact_pii(
    df: DataFrame, text_col: str, *, out_col: str | None = None
) -> DataFrame:
    """Redact PII in ``text_col`` (in place by default) and append one
    ``n_<type>`` count column per pattern plus ``n_pii`` (the total).

    Map-side only: the added plan nodes are a single Project over the
    scan — no shuffle, no state, safe on unbounded streams.
    """
    target = out_col or text_col
    counts = pii_counts(F.col(text_col))
    out = df
    for name, c in counts.items():
        out = out.withColumn(f"n_{name}", c.cast("bigint"))
    total = sum(
        (F.col(f"n_{n}") for n, _, _ in PII_PATTERNS[1:]),
        F.col(f"n_{PII_PATTERNS[0][0]}"),
    )
    return out.withColumn("n_pii", total.cast("bigint")).withColumn(
        target, redact_text(F.col(text_col))
    )
