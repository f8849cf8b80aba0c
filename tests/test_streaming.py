"""Structured Streaming tests: the stream plan must agree exactly with its
batch twin over the same files (availableNow trigger)."""

import pytest

from hive_scripts_spark.streaming.windowed import (
    hourly_event_counts,
    read_event_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def test_stream_matches_batch(spark, tmp_path):
    # file stream sources need a directory; stage the events file into one
    import shutil

    stream_dir = tmp_path / "events_stream"
    stream_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", stream_dir / "part-0000.parquet")

    stream = read_event_stream(spark, str(stream_dir))
    assert stream.isStreaming

    out = hourly_event_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("hourly_test")
        .outputMode("append")  # watermark allows append for windowed aggs
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    # batch twin over the same files
    from hive_scripts_spark.plans.registry import QUERIES

    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in QUERIES["x_events_hourly"](spark, SF_DIR).collect()
    }
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.table("hourly_test").collect()
    }
    # append mode emits only windows closed by the watermark; availableNow
    # over a finite source closes all but the trailing window(s)
    assert streamed, "stream produced output"
    for k, v in streamed.items():
        assert batch[k] == v
    # coverage: at least 90% of batch windows must have been emitted
    assert len(streamed) >= 0.9 * len(batch)


def test_streaming_partition_counts(spark, tmp_path):
    """The micro-batch twin of UC#1 partition counts (SURVEY §7.9)."""
    import shutil

    from hive_scripts_spark.streaming.windowed import streaming_partition_counts

    d = tmp_path / "ev"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", d / "f0.parquet")
    out = streaming_partition_counts(read_event_stream(spark, str(d)))
    q = (
        out.writeStream.format("memory")
        .queryName("spc")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = spark.table("spc")
    assert got.count() > 0
    # every emitted (window, type) count matches the batch groupBy
    from hive_scripts_spark.plans.registry import table as load
    from pyspark.sql import functions as F

    ev = load(spark, SF_DIR, "events")
    batch = {
        (r["w"], r["event_type"]): r["n"]
        for r in ev.groupBy(
            F.window("ts", "1 hour").start.alias("w"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in got.collect():
        assert batch[(r["window_start"], r["event_type"])] == r["row_count"]
