"""HTML/markup-to-text extraction for web-crawl corpus preparation.

The first step of every C4 / CCNet / RefinedWeb-style pipeline is turning
crawled HTML into clean training text: drop ``<script>``/``<style>``
payloads and comments wholesale, turn block-level boundaries into
newlines so paragraph structure survives for the downstream line-level
passes (``remove_boilerplate_lines``, ``dedup_lines_within_doc``), strip
every remaining tag, decode the common entities, and squeeze whitespace.

Implemented as a fixed ORDERED chain of ``regexp_replace`` / literal
``replace`` expressions — pure map-side, no shuffle, no Python, no
state, so it is streaming-safe and costs one Project over the scan at
any corpus size (the 100 TB plan is identical to the 100 MB plan).

Pattern syntax is restricted to the intersection of Java regex (Spark)
and RE2 (DuckDB): inline ``(?is)`` flags, non-greedy ``.*?``, character
classes — no lookarounds, no backreferences — so the DuckDB oracle
replays the SAME patterns and the cleaned text is hash-exact across
engines.

Order is part of the contract:

1. ``script`` / ``style`` blocks (content and all) and comments go
   first — their bodies must never leak tokens into the text.
2. Block-level closers and ``<br>`` become newlines BEFORE the generic
   tag strip (which turns the remaining tags into spaces).
3. Entities decode after tag handling (so ``&lt;p&gt;`` in prose is
   never mistaken for markup), with ``&amp;`` LAST — the single-pass
   decode order that leaves ``&amp;lt;`` as the literal text ``&lt;``
   instead of double-decoding it.
4. Whitespace squeezing runs last, on the final character stream.

Reference parity note: the reference engine (nexpresso) has no markup
handling at all — this module is part of the training-data pipeline
surface built on top of the ported operator set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — regex stages, applied in list order.
# Replacements contain no Java-replacement metacharacters ($, \).
MARKUP_PATTERNS: list[tuple[str, str, str]] = [
    ("script", r"(?is)<script[^>]*>.*?</script>", " "),
    ("style", r"(?is)<style[^>]*>.*?</style>", " "),
    ("comment", r"(?s)<!--.*?-->", " "),
    (
        "block_break",
        r"(?i)</(?:p|div|li|ul|ol|h[1-6]|tr|table|blockquote|section|article)>"
        r"|<br\s*/?\s*>",
        "\n",
    ),
    ("tag", r"(?s)</?[a-zA-Z!][^>]*>", " "),
]

# (entity, character) — literal decodes, applied in list order; &amp;
# MUST stay last (single-pass decode: "&amp;lt;" -> literal "&lt;").
ENTITY_DECODES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]

# (name, pattern, replacement) — whitespace normalization, in order:
# horizontal runs collapse to one space, spaces hugging a newline drop,
# 3+ newlines collapse to a paragraph break.
SQUEEZE_PATTERNS: list[tuple[str, str, str]] = [
    ("hspace", r"[ \t\r\x0b\f]+", " "),
    ("newline_hug", r" ?\n ?", "\n"),
    ("paragraph", r"\n{3,}", "\n\n"),
    # Edge trim as a regex stage (NOT F.trim, which strips only spaces)
    # so the whole chain — edges included — replays in the oracle.
    ("edge_trim", r"^\s+|\s+$", ""),
]


# Probe patterns for the `had_markup` triage flag (shared with the
# DuckDB oracle replay — same Java∩RE2 syntax discipline as the chain).
TAG_PROBE = r"</?[a-zA-Z!][^>]*>|<!--"
ENTITY_PROBE = r"&(?:lt|gt|quot|nbsp|amp|#39);"


def cleaned_text(col: Column) -> Column:
    """The markup-stripped, entity-decoded, whitespace-squeezed form of
    ``col`` (NULL in, NULL out)."""
    out = col
    for _, pattern, replacement in MARKUP_PATTERNS:
        out = F.regexp_replace(out, pattern, replacement)
    for entity, char in ENTITY_DECODES:
        out = F.replace(out, F.lit(entity), F.lit(char))
    for _, pattern, replacement in SQUEEZE_PATTERNS:
        out = F.regexp_replace(out, pattern, replacement)
    return out


def strip_markup(
    df: DataFrame, text_col: str, *, out_col: str | None = None
) -> DataFrame:
    """Strip HTML-ish markup from ``text_col`` (in place by default) and
    append ``had_markup`` — whether the ORIGINAL text contained any
    tag/comment/entity the chain acts on (cheap triage column: a corpus
    slice can skip re-cleaning when nothing matched).

    Map-side only: one Project over the scan — no shuffle, no state,
    identical under ``readStream``. At 100 TB this is bandwidth-bound on
    the scan itself; there is nothing to partition or salt.
    """
    if text_col not in df.columns:
        raise ValueError(f"column {text_col!r} not in DataFrame")
    target = out_col or text_col
    src = F.col(text_col)
    had = F.coalesce(
        src.rlike(TAG_PROBE) | src.rlike(ENTITY_PROBE), F.lit(False)
    )
    return df.withColumn("had_markup", had).withColumn(
        target, cleaned_text(src)
    )
