"""Fuzzy (edit-distance) string join without a cross join.

Joining on "name is within k edits" is a non-equi predicate that Spark
would otherwise plan as a cartesian/nested-loop — quadratic. The
scalable form here is SYMSPELL-STYLE DELETION-NEIGHBORHOOD BLOCKING
(Garbe's SymSpell; same family as q-gram signature joins): if
``levenshtein(a, b) <= k`` then some string is obtainable from BOTH by
deleting at most ``k`` characters (take an optimal edit script and
delete from each side every character it touches). So:

1. reduce each side to its DISTINCT (exact-key, string) pairs — the
   variant explode and candidate join never see payload columns or
   duplicate strings;
2. explode each distinct string into its <=k-deletion variants
   (``1 + len`` variants at k=1, ``O(len^2/2)`` at k=2);
3. equi-join on the variant (plus any exact ``on`` keys) — an ordinary
   hash join Catalyst shuffles by variant;
4. dedup candidate STRING pairs (narrow: the two join strings + ``on``
   keys only) and verify with the EXACT
   ``levenshtein(a, b, threshold)`` (early-exit form);
5. join the verified string-pair table back to the original left and
   right rows to re-attach payloads (AQE broadcasts the pair table
   when it is small, which at corpus scale it is relative to rows).

The blocking is EXHAUSTIVE (no missed pairs — unlike LSH) and the
verify makes it exact, so a brute-force SQL oracle agrees row-for-row —
including multiplicity: because payloads re-attach by joining rows to
verified string pairs, duplicate input rows each produce their own
output pairs, exactly like the quadratic join they replace.

Shuffle volume is |distinct strings| x (variants per string); keep
``max_distance`` at 1-2 for name-length strings (the entity-resolution
sweet spot) — variant counts grow ``~ 1 + L + L(L-1)/2`` at k=2.
Measured ceiling (bench ``scale_probe.fuzzy_k2_long_strings``): k=2 on
40-char strings is 801 variants/string — 4.0M variant rows per side
for just 5k strings, ~12 s at local[32]. Practical rule: at k=2 keep
the join key at L <= ~64 chars (truncate, or pre-block on a coarser
key via ``on=``); beyond that the variant explode dominates and a
q-gram/LSH prefilter is the right tool.

Measured at sf0.1 (15k customer names, 18-19 chars, k=1, local[32]):
variant explode 223k rows/side, candidate join 2.2M narrow pairs,
262k verified matches, with the dedup exchange carrying only
(name_a, name_b) — against a 225M-levenshtein quadratic baseline. The
verify dominates; the ``levenshtein(a, b, threshold)`` early-exit form
is the measured right choice (4.6 s vs 8.0 s for plain
``levenshtein <= k`` on the same candidates), and no stage is
driver-side (plan pinned in tests/test_fuzzyjoin.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _delete_one(col: Column) -> Column:
    """Array of every string obtainable by deleting exactly one char."""
    n = F.length(col)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(
            col.substr(F.lit(1), i - 1), col.substr(i + 1, n)
        ),
    )


def deletion_variants(col: Column, k: int) -> Column:
    """Distinct strings obtainable from ``col`` by deleting at most ``k``
    characters (includes the string itself). NULL input yields NULL."""
    variants = F.array(col)
    frontier = F.array(col)
    for _ in range(k):
        frontier = F.array_distinct(
            F.flatten(F.transform(frontier, _delete_one))
        )
        variants = F.array_distinct(F.concat(variants, frontier))
    return variants


def _variant_expr(col: Column, k: int) -> Column:
    """Variant array for the candidate join. Always the DISTINCT form:
    skipping ``array_distinct`` saves ~40% of expression time per side
    (measured) but duplicate variants multiply on BOTH join sides —
    strings with repeated-character runs (e.g. zero-padded ids, where
    deleting any char of the run yields the same variant) blow the
    candidate join up quadratically per pair (measured at sf0.1:
    14.3 s vs 6.4 s end-to-end). Distinctness at the source is the
    scale-safe choice."""
    return deletion_variants(col, k)


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    right_on: str,
    max_distance: int = 1,
    on: list[str] | None = None,
) -> DataFrame:
    """Join rows whose ``left_on``/``right_on`` strings are within
    ``max_distance`` Levenshtein edits, optionally also matching exact
    ``on`` keys. Returns all left columns, all non-key right columns,
    and an integer ``distance`` column.

    Rows with NULL join strings (or NULL ``on`` keys) match nothing.
    Output multiplicity matches the quadratic join it replaces: every
    qualifying (left row, right row) pair appears exactly once, and
    duplicate input rows each contribute their own pairs.
    ``max_distance`` must be 1 or 2 — beyond that the deletion
    neighborhood explodes combinatorially; block on a coarser key first.
    """
    if max_distance not in (1, 2):
        raise ValueError(
            f"max_distance must be 1 or 2: {max_distance} "
            "(larger radii need coarser pre-blocking)"
        )
    on = list(on or [])
    reserved = {"__v", "distance"}
    taken = reserved & (set(left.columns) | set(right.columns))
    if taken:
        raise ValueError(
            f"columns {sorted(taken)} collide with fuzzy_join internals; "
            "rename before joining"
        )
    right_payload = [c for c in right.columns if c not in on]
    overlap = set(right_payload) & set(left.columns)
    if overlap:
        raise ValueError(
            f"right columns {sorted(overlap)} collide with left columns; "
            "rename before joining"
        )
    if left_on == right_on:
        raise ValueError(
            f"left_on and right_on must differ as column names "
            f"(both {left_on!r}); alias one side before joining"
        )

    # Narrow, distinct (on-keys, string) tables: payloads and duplicate
    # strings never enter the variant explode or the candidate exchange.
    l_names = (
        left.select(*on, left_on)
        .filter(F.col(left_on).isNotNull())
        .distinct()
    )
    r_names = (
        right.select(*on, right_on)
        .filter(F.col(right_on).isNotNull())
        .distinct()
    )
    l_var = l_names.withColumn(
        "__v", F.explode(_variant_expr(F.col(left_on), max_distance))
    )
    r_var = r_names.withColumn(
        "__v", F.explode(_variant_expr(F.col(right_on), max_distance))
    )
    # The variant join must NOT broadcast: both sides are corpus-scale
    # after the explode (Catalyst's pre-explode size estimate undershoots
    # badly), and a broadcast hash probe here measured 3.5x slower than
    # the shuffle hash join even at sf0.1 (8.1 vs 2.3 s). SHUFFLE_HASH
    # also skips the sort a merge join would add.
    candidates = (
        l_var.hint("shuffle_hash")
        .join(r_var.hint("shuffle_hash"), on=[*on, "__v"], how="inner")
        .drop("__v")
    )
    # A pair sharing several variants surfaces several times. Verify
    # FIRST (the early-exit levenshtein is map-side and cheap), THEN
    # dedup on the NARROW key set (on-keys + the two strings): the
    # dedup exchange carries only verified narrow pairs — measured at
    # sf0.1 that is 540k rows instead of 1.9M, and never any payload
    # columns. ``isin`` keeps the pushed-down verify to ONE levenshtein
    # evaluation per candidate (a >=0 AND <=k conjunction evaluates it
    # twice inside the join condition — measured ~12% slower).
    dist = F.levenshtein(F.col(left_on), F.col(right_on), max_distance)
    verified = (
        candidates.withColumn("distance", dist)
        .filter(dist.isin(list(range(max_distance + 1))))
        .dropDuplicates([*on, left_on, right_on])
    )
    # Re-attach payloads: each original row joins to every verified
    # string pair it participates in. Equi-joins on (on, string); the
    # pair table is small relative to the corpus, so AQE broadcasts it.
    out = left.join(verified, on=[*on, left_on], how="inner").join(
        right, on=[*on, right_on], how="inner"
    )
    return out.select(*left.columns, *right_payload, "distance")
