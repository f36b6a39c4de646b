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
    from polars_nexpresso_spark.compat import (
        HAS_APPLY_IN_PANDAS_WITH_STATE,
        require,
    )

    require(
        "streaming_exact_dedup (applyInPandasWithState)",
        HAS_APPLY_IN_PANDAS_WITH_STATE,
        "3.4",
    )
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


def merge_topk(
    prev: list[tuple], incoming: list[tuple], score_idx: int, k: int
) -> tuple[list[tuple], list[tuple]]:
    """Pure top-k merge kernel: returns ``(new_state, admitted)`` where
    ``new_state`` is the k highest-scoring tuples of ``prev + incoming``
    (nulls sort last) and ``admitted`` are the multiset-new entries —
    the delta a batch emits. Exposed separately so the semantics are unit-
    testable without a streaming runtime."""
    merged = sorted(
        prev + incoming,
        key=lambda t: (t[score_idx] is not None, t[score_idx]),
        reverse=True,
    )[:k]
    prev_counts: dict[tuple, int] = {}
    for t in prev:
        prev_counts[t] = prev_counts.get(t, 0) + 1
    admitted = []
    for t in merged:
        if prev_counts.get(t, 0) > 0:
            prev_counts[t] -= 1
        else:
            admitted.append(t)
    return merged, admitted


def streaming_topk(
    stream: DataFrame,
    *,
    keys: list[str],
    score_col: str,
    k: int,
    payload_cols: list[str],
    engine: str = "auto",
) -> DataFrame:
    """Maintain the running top-``k`` rows per key (highest ``score_col``)
    across all micro-batches.

    Emission is **delta-style**: a batch emits only the rows *newly admitted*
    to a key's top-k in that batch (some may later be evicted by higher
    scores). Every row ever in a top-k is emitted exactly once, so the final
    exact top-k is reconstructable downstream as ``top-k over all emitted
    rows`` — append-friendly, no retraction needed. This mirrors how a
    training-data pipeline keeps e.g. the k highest-quality documents per
    source while the crawl streams in. Both engines share the
    :func:`merge_topk` kernel, so semantics are engine-independent.

    Engines:

    - ``"tws"`` — the Spark 4.x arbitrary-state API
      (``transformWithStateInPandas`` + ``ListState``). Preferred on
      clusters: composable timers/TTL and the RocksDB state store
      (``spark.sql.streaming.stateStore.providerClass =
      ...state.RocksDBStateStoreProvider``) keep state off-heap. Its wire
      protocol needs the ``protobuf`` Python package at query start.
    - ``"pandas_state"`` — ``applyInPandasWithState`` storing each state
      column as an array (one ≤k-tuple list per key). No extra runtime
      deps; works from PySpark 3.4.
    - ``"auto"`` (default) — ``tws`` when available (API + protobuf), else
      ``pandas_state``.

    Scale design (both engines): state is at most ``k`` tuples per key,
    hash-sharded across executors by ``keys`` — O(k) per key, independent
    of stream length.

    No reference analog (the reference has no streaming surface,
    SURVEY.md §2.F); this is a pipeline extension.
    """
    from polars_nexpresso_spark.compat import (
        HAS_APPLY_IN_PANDAS_WITH_STATE,
        HAS_PROTOBUF,
        HAS_TRANSFORM_WITH_STATE,
        require,
    )

    if engine == "auto":
        engine = (
            "tws"
            if (HAS_TRANSFORM_WITH_STATE and HAS_PROTOBUF)
            else "pandas_state"
        )
    if engine not in ("tws", "pandas_state"):
        raise ValueError(
            f"engine must be 'auto', 'tws' or 'pandas_state', got {engine!r}"
        )

    cols = list(keys) + [score_col] + [c for c in payload_cols if c != score_col]
    in_schema = {f.name: f.dataType.simpleString() for f in stream.schema.fields}
    missing = [c for c in cols if c not in in_schema]
    if missing:
        raise ValueError(f"columns not in stream: {missing}")
    state_cols = [c for c in cols if c not in keys]
    out_ddl = ", ".join(f"`{c}` {in_schema[c]}" for c in cols)
    score_idx = state_cols.index(score_col)

    if engine == "tws":
        require(
            "streaming_topk (transformWithStateInPandas)",
            HAS_TRANSFORM_WITH_STATE,
            "4.0",
        )
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        state_ddl = ", ".join(f"`{c}` {in_schema[c]}" for c in state_cols)

        class _TopK(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._state = handle.getListState("topk", state_ddl)

            def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
                batch = pd.concat(list(rows), ignore_index=True)
                incoming = [
                    tuple(t)
                    for t in batch[state_cols].itertuples(index=False, name=None)
                ]
                prev = (
                    [tuple(t) for t in self._state.get()]
                    if self._state.exists()
                    else []
                )
                merged, admitted = merge_topk(prev, incoming, score_idx, k)
                self._state.put(merged)
                if admitted:
                    out = pd.DataFrame(admitted, columns=state_cols)
                    for i, kc in enumerate(keys):
                        out.insert(i, kc, key[i])
                    yield out[cols]

            def close(self) -> None:
                pass

        return stream.groupBy(*keys).transformWithStateInPandas(
            _TopK(), out_ddl, outputMode="Update", timeMode="None"
        )

    require(
        "streaming_topk (applyInPandasWithState)",
        HAS_APPLY_IN_PANDAS_WITH_STATE,
        "3.4",
    )
    # Column-major state: one array per state column holding the ≤k kept
    # tuples (applyInPandasWithState state is a single typed tuple, so the
    # tuple list is transposed into arrays and back).
    state_ddl = ", ".join(f"`{c}` array<{in_schema[c]}>" for c in state_cols)

    def topk_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        incoming: list[tuple] = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            incoming.extend(
                tuple(t)
                for t in pdf[state_cols].itertuples(index=False, name=None)
            )
        prev = list(zip(*state.get)) if state.exists else []
        merged, admitted = merge_topk(prev, incoming, score_idx, k)
        if merged:
            state.update(tuple(list(col) for col in zip(*merged)))
        if admitted:
            out = pd.DataFrame(admitted, columns=state_cols)
            for i, kc in enumerate(keys):
                out.insert(i, kc, key[i])
            yield out[cols]

    return stream.groupBy(*keys).applyInPandasWithState(
        topk_fn, out_ddl, state_ddl, "update", GroupStateTimeout.NoTimeout
    )


def streaming_cap_per_group(
    stream: DataFrame,
    group_col: str,
    *,
    max_n: int,
) -> DataFrame:
    """Emit at most ``max_n`` rows per group over the stream's LIFETIME —
    the ingest-time analog of ``sampling.cap_per_group`` (per-domain /
    per-source share caps applied while the crawl is still arriving,
    instead of a batch pass after landing everything).

    First-arrival wins: once a group has emitted ``max_n`` rows, every
    later row of that group is dropped, across micro-batches. (The batch
    variant picks survivors by id hash for layout-independence; a stream
    cannot retract already-emitted rows, so arrival order IS the
    selection — the deterministic-replay caveat every append-mode
    streaming operator shares.)

    Scale design: state is sharded BY GROUP (hash-partitioned slots, one
    8-byte counter each — O(#groups) state total, no row retention); each
    batch does one bounded ``head`` per group. State never needs a TTL:
    a saturated counter is exactly the information future batches need.
    """
    from polars_nexpresso_spark.compat import (
        HAS_APPLY_IN_PANDAS_WITH_STATE,
        require,
    )

    require(
        "streaming_cap_per_group (applyInPandasWithState)",
        HAS_APPLY_IN_PANDAS_WITH_STATE,
        "3.4",
    )
    if max_n < 1:
        raise ValueError(f"max_n must be >= 1: {max_n}")
    out_schema = stream.schema

    def cap(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        taken = state.get[0] if state.exists else 0
        for pdf in pdfs:
            room = max_n - taken
            if room <= 0 or pdf.empty:
                continue
            emit = pdf.head(room)
            taken += len(emit)
            yield emit
        state.update((taken,))

    return stream.groupBy(group_col).applyInPandasWithState(
        cap,
        out_schema,
        "taken long",
        "append",
        GroupStateTimeout.NoTimeout,
    )
