"""Structured Streaming pack tests: the streaming plan must produce exactly
the batch result once all data is processed (processAllAvailable +
equivalence with the batch plan on the same input)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from polars_nexpresso_spark.streaming.pack_stream import (
    session_pack,
    unpack_stream,
    windowed_pack,
)
from tests.conftest import assert_same_rows


@pytest.fixture()
def events_path(spark):
    src = "/root/testdata/sf0.001/events.parquet"
    tmp = tempfile.mkdtemp(prefix="pns_stream_")
    # Re-write as a multi-file directory so the file streaming source can
    # discover it incrementally.
    df = spark.read.parquet(src).limit(2000)
    # ts has been generated both as long nanos (nanosAsLong read of
    # TIMESTAMP(NANOS)) and as timestamp[us] across testdata generations —
    # branch on the actual dtype, same as queries._events_with_event_time.
    if dict(df.dtypes)["ts"] == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    else:
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    df.repartition(4).write.mode("overwrite").parquet(f"{tmp}/input")
    yield tmp
    shutil.rmtree(tmp, ignore_errors=True)


def _pack_kwargs():
    return dict(
        event_time="ts",
        window_duration="1 hour",
        watermark="30 minutes",
        keys=["user_id"],
        payload_cols=["event_id", "event_type", "value"],
        order_by=["ts", "event_id"],
    )


def test_windowed_pack_stream_matches_batch(spark, events_path):
    batch_df = spark.read.parquet(f"{events_path}/input")
    expected = windowed_pack(batch_df, **_pack_kwargs())

    stream = spark.readStream.schema(batch_df.schema).parquet(f"{events_path}/input")
    packed = windowed_pack(stream, **_pack_kwargs())
    assert packed.isStreaming

    query = (
        packed.writeStream.format("memory")
        .queryName("packed_events")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)

    got = spark.table("packed_events")
    # Append mode only emits windows older than the watermark; the final
    # (max-event-time) window may be withheld. Compare on the closed set.
    max_start = [
        r[0] for r in got.agg(F.max("window_start")).collect()
    ][0]
    if max_start is not None:
        expected_closed = expected.filter(F.col("window_start") <= F.lit(max_start))
        got_closed = got.filter(F.col("window_start") <= F.lit(max_start))
        assert_same_rows(expected_closed, got_closed)
    assert got.count() > 0


def _session_kwargs():
    return dict(
        event_time="ts",
        gap="6 hours",
        watermark="30 minutes",
        keys=["user_id"],
        payload_cols=["event_id", "event_type", "value"],
        order_by=["ts", "event_id"],
    )


def test_session_pack_stream_matches_batch(spark, events_path):
    import datetime as dt

    from tests.conftest import canonical_rows

    # Time-ranged files: arrival order respects event time, so watermark
    # progression across microbatches never drops in-order data (round-robin
    # files would interleave the whole time range into every batch).
    batch_df = spark.read.parquet(f"{events_path}/input")
    ranged = f"{events_path}/ranged"
    batch_df.repartitionByRange(4, F.col("ts")).write.mode("overwrite").parquet(ranged)
    batch_df = spark.read.parquet(ranged)
    expected = session_pack(batch_df, **_session_kwargs())

    stream = spark.readStream.schema(batch_df.schema).parquet(ranged)
    packed = session_pack(stream, **_session_kwargs())
    assert packed.isStreaming

    query = (
        packed.writeStream.format("memory")
        .queryName("session_events")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)

    got = spark.table("session_events")
    # Append mode only emits sessions whose END the final watermark passed;
    # anything later is withheld. So: emitted ⊆ batch, and every batch
    # session safely inside the watermark horizon must have been emitted.
    got_rows = set(canonical_rows(got))
    expected_rows = set(canonical_rows(expected))
    assert got_rows <= expected_rows
    # Emission lags the watermark by one microbatch (availableNow runs no
    # closing no-data batch), so the guaranteed-emitted horizon is the
    # watermark as of the second-to-last of the 4 time-ranged files ≈ the
    # 70th-percentile event time.
    ts_sorted = [r[0] for r in batch_df.select("ts").orderBy("ts").collect()]
    cutoff = ts_sorted[int(len(ts_sorted) * 0.7)] - dt.timedelta(minutes=31)
    must_emit = set(
        canonical_rows(expected.filter(F.col("session_end") < F.lit(cutoff)))
    )
    assert must_emit <= got_rows
    assert got.count() > 0


def test_session_pack_gap_semantics(spark):
    """Events within the gap merge; a gap >= the duration splits sessions."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base, "a", 1.0),
        (2, base + dt.timedelta(minutes=4), "b", 2.0),   # merges (< 5 min)
        (3, base + dt.timedelta(minutes=9), "c", 3.0),   # merges (< 5 min after #2)
        (4, base + dt.timedelta(minutes=14, seconds=1), "d", 4.0),  # splits (> 5 min)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type", "value"]).withColumn(
        "user_id", F.lit(7)
    )
    out = session_pack(
        df,
        event_time="ts",
        gap="5 minutes",
        watermark="1 minute",
        keys=["user_id"],
        payload_cols=["event_id"],
        order_by=["event_id"],
    ).collect()
    sizes = sorted(r["n_events"] for r in out)
    assert sizes == [1, 3]
    big = next(r for r in out if r["n_events"] == 3)
    assert [e["event_id"] for e in big["events"]] == [1, 2, 3]


def test_streaming_exact_dedup_across_batches(spark):
    """applyInPandasWithState dedup: duplicates are dropped across
    micro-batches (maxFilesPerTrigger=1 forces one batch per file)."""
    from polars_nexpresso_spark.streaming.stateful import streaming_exact_dedup

    tmp = tempfile.mkdtemp(prefix="pns_dedup_")
    try:
        spark.createDataFrame(
            [(1, "fp_a"), (2, "fp_b"), (3, "fp_c")], ["doc_id", "fingerprint"]
        ).coalesce(1).write.parquet(f"{tmp}/in/batch0")
        spark.createDataFrame(
            [(4, "fp_b"), (5, "fp_d"), (6, "fp_a"), (7, "fp_d")],
            ["doc_id", "fingerprint"],
        ).coalesce(1).write.parquet(f"{tmp}/in/batch1")

        schema = "doc_id long, fingerprint string"
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in/*")
        )
        deduped = streaming_exact_dedup(stream, fingerprint_col="fingerprint")
        q = (
            deduped.writeStream.format("memory")
            .queryName("dedup_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.table("dedup_out").collect()
        by_fp = {r["fingerprint"]: r["doc_id"] for r in rows}
        # one row per distinct fingerprint; cross-batch dup fp_a/fp_b dropped,
        # within-batch dup fp_d deduped too
        assert len(rows) == 4
        assert set(by_fp) == {"fp_a", "fp_b", "fp_c", "fp_d"}
        assert by_fp["fp_d"] in (5, 7)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_windowed_pack_batch_roundtrip(spark, events_path):
    batch_df = spark.read.parquet(f"{events_path}/input")
    packed = windowed_pack(batch_df, **_pack_kwargs())
    unpacked = unpack_stream(packed)

    original = batch_df.select("event_id", "event_type", "value", "user_id")
    restored = unpacked.select("event_id", "event_type", "value", "user_id")
    assert_same_rows(original, restored)


def test_windowed_pack_child_order(spark, events_path):
    batch_df = spark.read.parquet(f"{events_path}/input")
    packed = windowed_pack(batch_df, **_pack_kwargs())
    row = packed.filter(F.col("n_events") >= 2).first()
    if row is not None:
        ids = [e["event_id"] for e in row["events"]]
        # children sorted by (ts, event_id) — event_ids are ts-ordered in
        # the synthetic data, so within a window they ascend
        assert ids == sorted(ids)


def _run_streaming_topk(spark, tmp: str, engine: str) -> None:
    """Shared driver for the cross-batch top-k contract: delta emissions
    across 3 micro-batches (maxFilesPerTrigger=1 → one batch per file)
    reconstruct the exact batch top-k."""
    from polars_nexpresso_spark.streaming.stateful import streaming_topk

    b0 = [("en", 1, 0.9), ("en", 2, 0.5), ("en", 3, 0.7), ("de", 4, 0.4)]
    b1 = [("en", 5, 0.8), ("en", 6, 0.1), ("de", 7, 0.6), ("de", 8, 0.2)]
    b2 = [("en", 9, 0.95), ("de", 10, 0.3)]
    cols = ["lang", "doc_id", "score"]
    for i, rows in enumerate([b0, b1, b2]):
        spark.createDataFrame(rows, cols).coalesce(1).write.parquet(
            f"{tmp}/in/batch{i}"
        )

    stream = (
        spark.readStream.schema("lang string, doc_id long, score double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/in/*")
    )
    topk = streaming_topk(
        stream,
        keys=["lang"],
        score_col="score",
        k=2,
        payload_cols=["doc_id"],
        engine=engine,
    )
    name = f"topk_out_{engine}"
    q = (
        topk.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    emitted = spark.table(name).collect()
    # every row ever admitted to a top-2 is emitted exactly once
    emitted_ids = sorted(r["doc_id"] for r in emitted)
    assert emitted_ids == sorted(set(emitted_ids))
    # reconstruction: top-2 over emitted rows == batch top-2 over all data
    final = {}
    for r in emitted:
        final.setdefault(r["lang"], []).append((r["score"], r["doc_id"]))
    recon = {lang: sorted(v, reverse=True)[:2] for lang, v in final.items()}
    assert recon["en"] == [(0.95, 9), (0.9, 1)]
    assert recon["de"] == [(0.6, 7), (0.4, 4)]
    # batch-2 admissions were deltas only: doc 6 (never top-2) not emitted
    assert 6 not in emitted_ids


def test_streaming_topk_across_batches(spark):
    """Full-runtime cross-batch top-k via the ``auto`` engine — runs in
    every environment (picks transformWithStateInPandas when its protobuf
    wire protocol is available, applyInPandasWithState otherwise; both
    share the merge_topk kernel, so the contract is engine-independent)."""
    tmp = tempfile.mkdtemp(prefix="pns_topk_")
    try:
        _run_streaming_topk(spark, tmp, "auto")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_topk_tws_engine(spark):
    """The transformWithStateInPandas engine specifically (RocksDB state
    store). Exercised wherever protobuf exists; the auto-engine test above
    keeps full-runtime coverage either way."""
    pytest.importorskip("google.protobuf")
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    tmp = tempfile.mkdtemp(prefix="pns_topk_tws_")
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    try:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        _run_streaming_topk(spark, tmp, "tws")
    finally:
        if prev_provider is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_topk_plan_builds_without_protobuf(spark):
    """Plan construction (schema derivation, state DDL, grouping) must not
    need the protobuf runtime — only query start does."""
    from polars_nexpresso_spark.streaming.stateful import streaming_topk

    tmp = tempfile.mkdtemp(prefix="pns_topk_plan_")
    try:
        stream = spark.readStream.schema(
            "lang string, doc_id long, score double"
        ).parquet(tmp)
        topk = streaming_topk(
            stream, keys=["lang"], score_col="score", k=3, payload_cols=["doc_id"]
        )
        assert topk.isStreaming
        assert [f.name for f in topk.schema.fields] == ["lang", "score", "doc_id"]
        with pytest.raises(ValueError, match="not in stream"):
            streaming_topk(
                stream, keys=["lang"], score_col="nope", k=3, payload_cols=["doc_id"]
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_read_any_stream_formats_plan_build(spark):
    """read_any_stream builds a streaming plan for each supported format
    (schema required — file streaming sources refuse inference)."""
    from polars_nexpresso_spark.sources.io import read_any_stream

    schema = "id long, name string"
    for fmt, ext in (("parquet", "parquet"), ("csv", "csv"), ("json", "jsonl")):
        tmp = tempfile.mkdtemp(prefix=f"pns_ras_{fmt}_")
        try:
            stream = read_any_stream(
                spark, f"{tmp}", format=fmt, schema=schema,
                max_files_per_trigger=2,
            )
            assert stream.isStreaming
            assert [f.name for f in stream.schema.fields] == ["id", "name"]
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


def test_read_any_stream_csv_available_now(spark):
    """End-to-end availableNow drain of a CSV directory source, including
    header handling and the maxFilesPerTrigger batching knob."""
    from polars_nexpresso_spark.sources.io import read_any_stream, write_any

    tmp = tempfile.mkdtemp(prefix="pns_ras_e2e_")
    try:
        batch = spark.range(100).select(
            F.col("id"), F.concat(F.lit("n"), F.col("id")).alias("name")
        )
        write_any(batch.repartition(4), f"{tmp}/in.csv", format="csv")
        stream = read_any_stream(
            spark, f"{tmp}/in.csv", format="csv",
            schema="id long, name string", max_files_per_trigger=1,
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("ras_csv")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.table("ras_csv")
        assert got.count() == 100
        assert {r["name"] for r in got.filter(F.col("id") < 2).collect()} == {
            "n0",
            "n1",
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_merge_topk_kernel():
    """Pure-kernel semantics of the streaming top-k: delta emission across a
    simulated 3-batch run reconstructs the exact batch top-k (the invariant
    the cluster-side transformWithState run relies on)."""
    from polars_nexpresso_spark.streaming.stateful import merge_topk

    batches = [
        [(1, 0.9), (2, 0.5), (3, 0.7)],
        [(5, 0.8), (6, 0.1)],
        [(9, 0.95), (9, 0.95)],  # duplicate rows admitted independently
    ]
    state: list[tuple] = []
    emitted: list[tuple] = []
    for b in batches:
        state, admitted = merge_topk(state, b, score_idx=1, k=2)
        emitted += admitted
    # final state is the true top-2 of all rows
    assert state == [(9, 0.95), (9, 0.95)]
    # doc 6 never entered a top-2 → never emitted; doc 2 was evicted but
    # emitted when admitted in batch 0
    ids = [t[0] for t in emitted]
    assert 6 not in ids and ids.count(9) == 2 and 1 in ids
    # reconstruction: top-2 over emitted rows == final state
    assert sorted(emitted, key=lambda t: -t[1])[:2] == state
    # nulls sort last
    st, adm = merge_topk([], [(1, None), (2, 0.1)], score_idx=1, k=1)
    assert st == [(2, 0.1)] and adm == [(2, 0.1)]


def test_streaming_ingest_pipeline_composition(spark):
    """The streaming training-data ingest shape, composed end-to-end on a
    real readStream: stateless decontamination (broadcast dictionary) →
    map-side quality gate (token count + repetition ratio) → cross-batch
    stateful exact dedup — one streaming plan, availableNow drain.

    The batch replica of the same composition (same operators, batch
    frames) must produce the same kept set, modulo dedup's arbitrary-but-
    single representative per fingerprint: fingerprint SETS must match."""
    from pyspark.sql import functions as F

    from polars_nexpresso_spark.functions.dedup import decontaminate_stream
    from polars_nexpresso_spark.functions.text import (
        doc_fingerprint,
        token_count,
    )
    from polars_nexpresso_spark.sources.io import read_table
    from polars_nexpresso_spark.streaming.stateful import streaming_exact_dedup

    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    eval_df = docs.filter(F.col("doc_id") < 25)

    tmp = tempfile.mkdtemp(prefix="pns_ingest_")
    try:
        docs.filter(F.col("doc_id") >= 25).repartition(3).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/in")
        static = spark.read.parquet(f"{tmp}/in")

        def pipeline(frame):
            cleaned = decontaminate_stream(frame, eval_df, "text", n=13)
            gated = cleaned.filter(token_count(F.col("text")) >= 10)
            fp = gated.withColumn(
                "fingerprint", doc_fingerprint(F.col("text"))
            )
            return streaming_exact_dedup(fp, fingerprint_col="fingerprint")

        # batch replica: same stages, dedup emulated by distinct fingerprint
        cleaned_b = decontaminate_stream(static, eval_df, "text", n=13)
        gated_b = cleaned_b.filter(token_count(F.col("text")) >= 10)
        expected_fps = {
            r["fp"]
            for r in gated_b.select(
                doc_fingerprint(F.col("text")).alias("fp")
            ).distinct().collect()
        }

        stream = spark.readStream.schema(static.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(f"{tmp}/in")
        kept = pipeline(stream)
        assert kept.isStreaming
        q = (
            kept.writeStream.format("memory")
            .queryName("ingest_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.table("ingest_out")
        got_fps = {r["fingerprint"] for r in got.collect()}
        assert got_fps == expected_fps
        # exactly one survivor per fingerprint
        assert got.count() == len(expected_fps)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_events_ts_dtype_branch_handles_both_generations(spark, tmp_path):
    """The testdata's events.ts has shipped both as long epoch-nanos (the
    nanosAsLong read of TIMESTAMP(NANOS)) and as timestamp[us]; the dtype
    branch in queries._events_with_event_time must normalize either
    generation to the SAME instants."""
    import datetime as dt

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (1, base, 7, "click", 1.0, "{}"),
        (2, base + dt.timedelta(minutes=90), 7, "view", 2.0, "{}"),
    ]
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    micros = spark.createDataFrame(rows, cols)
    nanos = micros.withColumn("ts", F.unix_micros(F.col("ts")) * 1000)
    assert dict(nanos.dtypes)["ts"] == "bigint"

    def branch(ev):
        if dict(ev.dtypes)["ts"] == "bigint":
            out = ev.withColumn(
                "ts_ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        else:
            out = ev.withColumn("ts_ts", F.col("ts").cast("timestamp"))
        return {
            r["event_id"]: r["us"]
            for r in out.select(
                "event_id", F.unix_micros("ts_ts").alias("us")
            ).collect()
        }

    got_micros = branch(micros)
    got_nanos = branch(nanos)
    assert got_micros == got_nanos
    assert got_nanos[2] - got_nanos[1] == 90 * 60 * 1_000_000


def test_events_ns_branch_division_is_exact(spark):
    """Epoch-ns values (~1.7e18) exceed double's 53-bit exact range
    (ulp ≈ 256 ns), so the ns→us conversion must use integer division —
    float division can land one microsecond off for ns values that are
    not multiples of ~512."""
    awkward_ns = 1_700_000_000_123_456_789  # not a multiple of 512
    df = spark.createDataFrame(
        [(1, awkward_ns, 7, "click", 1.0, "{}")],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    out = df.withColumn("ts_ts", F.timestamp_micros(F.expr("ts div 1000")))
    got = out.select(F.unix_micros("ts_ts").alias("us")).collect()[0]["us"]
    assert got == awkward_ns // 1000


def test_streaming_cap_per_group_across_batches(spark):
    """Lifetime per-group quota: a group saturated in batch 0 emits
    nothing in batch 1; partial room is filled exactly to the cap."""
    import shutil as _shutil
    import tempfile as _tempfile

    from polars_nexpresso_spark.streaming.stateful import (
        streaming_cap_per_group,
    )

    tmp = _tempfile.mkdtemp(prefix="pns_cap_")
    try:
        spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b")], ["doc_id", "source"]
        ).coalesce(1).write.parquet(f"{tmp}/in/batch0")
        spark.createDataFrame(
            [(4, "a"), (5, "b"), (6, "b"), (7, "c")],
            ["doc_id", "source"],
        ).coalesce(1).write.parquet(f"{tmp}/in/batch1")

        stream = (
            spark.readStream.schema("doc_id long, source string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in/*")
        )
        capped = streaming_cap_per_group(stream, "source", max_n=2)
        q = (
            capped.writeStream.format("memory")
            .queryName("cap_out")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.table("cap_out").collect()
        per = {}
        for r in rows:
            per.setdefault(r["source"], []).append(r["doc_id"])
        # a: saturated by batch 0 (2 rows), batch-1 row 4 dropped
        assert sorted(per["a"]) == [1, 2]
        # b: one from batch 0 + exactly one more from batch 1
        assert len(per["b"]) == 2 and 3 in per["b"]
        # c: under cap, passes through
        assert per["c"] == [7]

        import pytest as _pytest

        with _pytest.raises(ValueError, match="max_n"):
            streaming_cap_per_group(stream, "source", max_n=0)
    finally:
        _shutil.rmtree(tmp, ignore_errors=True)
