"""Custom stateful streaming operators: state must carry across
micro-batches (two-file source, maxFilesPerTrigger=1 forces two batches)."""

import shutil

import pytest
from pyspark.sql import functions as F

from hive_scripts_spark.streaming.stateful import (
    running_user_totals,
    streaming_dedup,
)
from hive_scripts_spark.streaming.windowed import read_event_stream

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def two_batch_dir(spark, tmp_path):
    # split events into two files so the stream runs two micro-batches
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    a = ev.where("event_id % 2 = 0")
    b = ev.where("event_id % 2 = 1")
    # duplicate some of batch A's rows into batch B to exercise dedup
    b = b.unionByName(a.limit(50))
    d = tmp_path / "stream_src"
    a.coalesce(1).write.parquet(str(d / "f0"))
    b.coalesce(1).write.parquet(str(d / "f1"))
    # flatten: file source wants files in one dir
    import glob

    out = tmp_path / "flat"
    out.mkdir()
    for i, f in enumerate(sorted(glob.glob(str(d / "f*" / "*.parquet")))):
        shutil.copy(f, out / f"batch-{i}.parquet")
    return str(out)


def test_running_totals_accumulate_across_batches(spark, two_batch_dir, tmp_path):
    stream = read_event_stream(spark, two_batch_dir).withColumn(
        "ts_long", F.unix_micros("ts")
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    # last update per user must equal the full batch aggregate
    latest = (
        spark.table("running_totals")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"), F.max("total_value").alias("total_value"))
    )
    got = {r["user_id"]: (r["n_events"], r["total_value"]) for r in latest.collect()}

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    dup = ev.where("event_id % 2 = 0").limit(50)
    full = ev.unionByName(dup)
    expect = {
        r["user_id"]: (r["n"], r["t"])
        for r in full.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("t"),
        )
        .collect()
    }
    assert set(got) == set(expect)
    for u in expect:
        assert got[u][0] == expect[u][0]
        assert abs(got[u][1] - expect[u][1]) < 0.05  # per-batch rounding drift


def test_streaming_dedup_drops_replays(spark, two_batch_dir, tmp_path):
    stream = read_event_stream(spark, two_batch_dir)
    q = (
        streaming_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    out = spark.table("dedup_out")
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert out.count() == n_events  # replayed 50 rows deduplicated away
    assert out.select("event_id").distinct().count() == n_events


def test_dedup_within_watermark_drops_replays(spark, tmp_path):
    """The built-in JVM-side dedup twin: a fully replayed file (every
    record duplicated) collapses back to exactly one row per event_id."""
    import shutil

    from hive_scripts_spark.streaming.stateful import dedup_within_watermark
    from hive_scripts_spark.streaming.windowed import read_event_stream

    d = tmp_path / "ev"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", d / "f0.parquet")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "f1-replay.parquet")

    out = dedup_within_watermark(read_event_stream(spark, str(d)))
    q = (
        out.writeStream.format("memory")
        .queryName("ddww")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    got = spark.table("ddww")
    n_distinct = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id")
        .distinct()
        .count()
    )
    assert got.count() == n_distinct
    # and each id exactly once
    assert got.select("event_id").distinct().count() == n_distinct


def test_replay_dedup_batch_matches_streaming(spark, two_batch_dir, tmp_path):
    """The oracled batch face (x_events_replay_dedup's operator) must
    produce exactly the rows the stateful streaming dedup emits over the
    same replayed frame."""
    from hive_scripts_spark.streaming.stateful import replay_dedup_batch

    stream = read_event_stream(spark, two_batch_dir)
    q = (
        streaming_dedup(stream)
        .writeStream.format("memory")
        .queryName("dedup_parity")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_parity"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    cols = ["event_id", "user_id", "event_type", "value"]
    got_stream = {tuple(r) for r in spark.table("dedup_parity").select(*cols).collect()}

    batch = spark.read.parquet(two_batch_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    got_batch = {
        tuple(r) for r in replay_dedup_batch(batch).select(*cols).collect()
    }
    assert got_batch == got_stream


def test_running_totals_on_rocksdb_state_store(spark, two_batch_dir, tmp_path):
    """r8 state-store evaluation, pinned: the RocksDB provider must (a)
    carry state across micro-batches with exact count parity to the
    batch aggregate, and (b) actually be engaged (rocksdb custom
    metrics in the query progress). Runs on an isolated newSession so
    the provider switch can't leak into other streaming tests."""
    from hive_scripts_spark.sources.events import normalize_event_ts
    from hive_scripts_spark.streaming.stateful import enable_rocksdb_state

    s = spark.newSession()
    enable_rocksdb_state(s)

    schema = s.read.parquet(two_batch_dir).schema
    raw = (
        s.readStream.schema(schema)
        .format("parquet")
        .option("path", two_batch_dir)
        .option("maxFilesPerTrigger", 1)  # force one batch per file
        .load()
    )
    stream = normalize_event_ts(raw).withColumn("ts_long", F.unix_micros("ts"))
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("rt_rocksdb")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_rocks"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    assert q.lastProgress["batchId"] >= 1  # state crossed a batch boundary
    rocks_metrics = {
        k
        for op in q.lastProgress.get("stateOperators", [])
        for k in (op.get("customMetrics") or {})
        if k.lower().startswith("rocksdb")
    }
    assert rocks_metrics, "RocksDB provider not engaged"

    latest = (
        s.table("rt_rocksdb")
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    got = {r["user_id"]: r["n_events"] for r in latest.collect()}
    ev = s.read.parquet(f"{SF_DIR}/events.parquet")
    dup = ev.where("event_id % 2 = 0").limit(50)
    expect = {
        r["user_id"]: r["n"]
        for r in ev.unionByName(dup)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expect
