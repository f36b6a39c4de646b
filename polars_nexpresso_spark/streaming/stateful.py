"""Custom stateful streaming operators via ``applyInPandasWithState``.

Where the built-in windowed/session aggregations (pack_stream.py) cover the
reference-shaped operators, this module holds the genuinely custom state
machines a training-data pipeline needs on unbounded streams. The first:
cross-batch exact deduplication.

Scale design: state is sharded BY FINGERPRINT — ``groupBy(fingerprint)``
gives each distinct content hash its own state slot, hash-partitioned
across executors, so state lookup is local and the per-group state is one
boolean (not an ever-growing set on some coarser key). State volume is
O(distinct fingerprints); bound it in production with a state TTL
(``GroupStateTimeout.ProcessingTimeTimeout`` + ``state.setTimeoutDuration``)
when the dedup horizon is finite.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "seen boolean"


def streaming_exact_dedup(
    stream: DataFrame,
    *,
    fingerprint_col: str,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Emit only the FIRST row ever seen per ``fingerprint_col`` across all
    micro-batches of a stream.

    Rows with a fingerprint already present in state (any earlier batch, or
    earlier in the same batch) are dropped. With ``ttl_ms`` set, a
    fingerprint's state expires after that processing-time TTL and the next
    occurrence is emitted again (bounded-state mode).
    """
    out_schema = stream.schema

    def dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        already = state.exists
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        first_emitted = already
        for pdf in pdfs:
            if first_emitted or pdf.empty:
                continue
            yield pdf.head(1)
            first_emitted = True
        if not already and first_emitted:
            state.update((True,))

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return stream.groupBy(fingerprint_col).applyInPandasWithState(
        dedup, out_schema, STATE_SCHEMA, "append", timeout
    )
