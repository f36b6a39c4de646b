"""Structured Streaming pack tests: the streaming plan must produce exactly
the batch result once all data is processed (processAllAvailable +
equivalence with the batch plan on the same input)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from polars_nexpresso_spark.streaming.pack_stream import unpack_stream, windowed_pack
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
