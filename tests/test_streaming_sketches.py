"""Batch/stream parity for the sketch twins: the streamed sketch must
equal the batch build over the same files, bit-for-bit — count-min via
the engine's incremental stateful aggregation, KMV via the idempotent
foreachBatch fold."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from hive_scripts_spark.operators import sketches as SK
from hive_scripts_spark.streaming.sketches import (
    kmv_sketch_sink,
    streaming_countmin,
)

SF_DIR = "/root/testdata/sf0.001"


def _stage_events(spark, tmp_path, n_files=4):
    """Split the events table into n parquet files so availableNow
    produces real multi-file micro-batches."""
    stream_dir = tmp_path / "events_stream"
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    df.repartition(n_files).write.parquet(str(stream_dir))
    # drop non-data files so maxFilesPerTrigger counts only parquet
    for p in stream_dir.glob("_*"):
        p.unlink() if p.is_file() else shutil.rmtree(p)
    return stream_dir


def test_streaming_countmin_matches_batch(spark, tmp_path):
    stream_dir = _stage_events(spark, tmp_path)
    batch_df = spark.read.parquet(str(stream_dir))
    schema = batch_df.schema
    stream = spark.readStream.schema(schema).parquet(str(stream_dir))

    out = streaming_countmin(stream, "user_id", depth=3, width=64)
    q = (
        out.writeStream.format("memory")
        .queryName("cm_stream_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    want = {
        (r["cm_row"], r["cm_bucket"]): r["cm_count"]
        for r in SK.countmin_build(
            batch_df, "user_id", depth=3, width=64
        ).collect()
    }
    got = {
        (r["cm_row"], r["cm_bucket"]): r["cm_count"]
        for r in spark.table("cm_stream_test").collect()
    }
    assert got == want and len(got) > 0


def test_kmv_foreachbatch_fold_matches_batch(spark, tmp_path):
    stream_dir = _stage_events(spark, tmp_path)
    batch_df = spark.read.parquet(str(stream_dir))
    schema = batch_df.schema
    sketch_dir = tmp_path / "kmv"

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(str(stream_dir))
    )
    # (user_id, ts) has hundreds of distinct pairs at sf0.001, so the
    # k=32 sketch fills and every micro-batch contributes candidates
    fold = kmv_sketch_sink(str(sketch_dir), ["user_id", "ts"], k=32)
    q = (
        stream.writeStream.foreachBatch(fold)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    stored = sorted(
        r["kmv_hash"]
        for r in spark.read.parquet(str(sketch_dir / "sketch")).collect()
    )
    whole = sorted(
        r["kmv_hash"]
        for r in SK.kmv_sketch(batch_df, ["user_id", "ts"], k=32).collect()
    )
    assert stored == whole and len(stored) == 32


def test_kmv_fold_is_idempotent_under_replay(spark, tmp_path):
    df = spark.range(500).select(F.col("id").cast("string").alias("k"))
    fold = kmv_sketch_sink(str(tmp_path / "kmv"), ["k"], k=16)
    fold(df, 0)
    once = sorted(
        r["kmv_hash"]
        for r in spark.read.parquet(str(tmp_path / "kmv" / "sketch")).collect()
    )
    fold(df, 0)  # replayed micro-batch (streaming retry)
    twice = sorted(
        r["kmv_hash"]
        for r in spark.read.parquet(str(tmp_path / "kmv" / "sketch")).collect()
    )
    assert once == twice
