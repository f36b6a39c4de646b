"""Process-wide registry for persisted intermediate tables.

Several operators persist a mid-plan table that feeds two downstream
subtrees (LSH blocking buckets, the OOV (group, token) count table, …).
A lazily-returned plan gives the library no "last action" signal to
unpersist on, so those caches are retained until released. Identical
re-plans are deduplicated by Spark's cache manager, but DIFFERENT
inputs in one long-lived session accumulate cached blocks — call
:func:`release_tracked_caches` between corpora (or
``spark.catalog.clearCache()`` for everything).

This module exists (rather than living in ``dedup``) so ``text`` and
other modules that ``dedup`` itself imports can share the registry
without an import cycle. ``dedup.release_blocking_caches`` remains the
public alias.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED_CACHES: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """Persist ``df`` MEMORY_AND_DISK and register it for release."""
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _TRACKED_CACHES.append(df)
    return df


def release_tracked_caches() -> int:
    """Unpersist every tracked intermediate cached in this process and
    return how many were released.

    Call between corpora in a long-lived session; safe while earlier
    result DataFrames are still alive (Spark recomputes on next action).
    """
    released = 0
    while _TRACKED_CACHES:
        df = _TRACKED_CACHES.pop()
        try:
            df.unpersist()
            released += 1
        except Exception:  # noqa: BLE001 — session may already be gone
            pass
    return released
