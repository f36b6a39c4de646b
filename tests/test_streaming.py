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
    # discover it incrementally; ts arrives as long nanos (nanosAsLong) and
    # is converted to a proper timestamp.
    df = spark.read.parquet(src).limit(2000)
    df = df.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
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
