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
    read_kmv_sketch,
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
    assert q.awaitTermination(240), "stream did not finish in time"

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
    assert q.awaitTermination(240), "stream did not finish in time"

    stored = sorted(
        r["kmv_hash"]
        for r in read_kmv_sketch(spark, str(sketch_dir)).collect()
    )
    whole = sorted(
        r["kmv_hash"]
        for r in SK.kmv_sketch(batch_df, ["user_id", "ts"], k=32).collect()
    )
    assert stored == whole and len(stored) == 32


def _stored(spark, root):
    return sorted(
        r["kmv_hash"] for r in read_kmv_sketch(spark, str(root)).collect()
    )


def test_kmv_fold_is_idempotent_under_replay(spark, tmp_path):
    df = spark.range(500).select(F.col("id").cast("string").alias("k"))
    root = tmp_path / "kmv"
    fold = kmv_sketch_sink(str(root), ["k"], k=16)
    fold(df, 0)
    once = _stored(spark, root)
    fold(df, 0)  # replayed micro-batch (streaming retry)
    assert _stored(spark, root) == once


def test_kmv_fold_crash_before_pointer_install_recovers(spark, tmp_path):
    """Crash window 1: the version dir was (partially) written but the
    pointer never moved. The replay must rebuild the version from the
    still-intact previous state — no data loss."""
    df0 = spark.range(0, 300).select(F.col("id").cast("string").alias("k"))
    df1 = spark.range(300, 600).select(F.col("id").cast("string").alias("k"))
    root = tmp_path / "kmv"
    fold = kmv_sketch_sink(str(root), ["k"], k=16)
    fold(df0, 0)
    # simulate the crash: batch 1's dir exists with garbage, pointer at v0
    bad = root / "sketch_v1"
    bad.mkdir()
    (bad / "junk").write_text("partial write")
    fold(df1, 1)  # the replay
    want = sorted(
        r["kmv_hash"]
        for r in SK.kmv_sketch(df0.unionByName(df1), ["k"], k=16).collect()
    )
    assert _stored(spark, root) == want
    # the partial dir is never rewritten in place — the rebuilt fold
    # lands in a fresh suffixed sibling (second r15 review pass)
    assert (root / "CURRENT").read_text() == "sketch_v1_r1"


def test_kmv_fold_replay_after_pointer_install_is_idempotent(spark, tmp_path):
    """Crash window 2, replayable source: the pointer moved but the
    engine never committed the batch, so batch 0 replays with the SAME
    content. The re-fold lands in a suffixed sibling version and the
    distinct-union merge leaves the sketch bit-identical."""
    df = spark.range(500).select(F.col("id").cast("string").alias("k"))
    root = tmp_path / "kmv"
    fold = kmv_sketch_sink(str(root), ["k"], k=16)
    fold(df, 0)
    before = _stored(spark, root)
    fold(df, 0)  # replay of batch 0 after its pointer committed
    assert _stored(spark, root) == before
    assert (root / "CURRENT").read_text() == "sketch_v0_r1"


def test_kmv_fold_replay_with_new_rows_folds_them_in(spark, tmp_path):
    """Crash window 2, NON-replayable source (or a fresh-checkpoint
    batch-0 collision, the r15 review finding): the same batch id
    re-delivers DIFFERENT rows. The old short-circuit silently dropped
    them forever; the suffixed-sibling re-fold must merge them in."""
    df = spark.range(500).select(F.col("id").cast("string").alias("k"))
    root = tmp_path / "kmv"
    fold = kmv_sketch_sink(str(root), ["k"], k=16)
    fold(df, 0)
    other = spark.range(900, 999).select(F.col("id").cast("string").alias("k"))
    fold(other, 0)  # same batch id, new content
    want = sorted(
        r["kmv_hash"]
        for r in SK.kmv_sketch(df.unionByName(other), ["k"], k=16).collect()
    )
    assert _stored(spark, root) == want
    # a second identical replay converges (no growth) in yet another
    # fresh sibling — existing dirs are NEVER rewritten in place, so a
    # reader that resolved sketch_v0 or _r1 keeps its directory for
    # the full keep window
    fold(other, 0)
    assert _stored(spark, root) == want
    assert (root / "CURRENT").read_text() == "sketch_v0_r2"
    assert (root / "sketch_v0").exists() and (root / "sketch_v0_r1").exists()


def test_kmv_fold_cleanup_keeps_newest_versions(spark, tmp_path):
    root = tmp_path / "kmv"
    fold = kmv_sketch_sink(str(root), ["k"], k=16, keep=2)
    for i in range(3):
        df = spark.range(i * 100, (i + 1) * 100).select(
            F.col("id").cast("string").alias("k")
        )
        fold(df, i)
    names = {d.name for d in root.glob("sketch_v*")}
    # keep=2: current + immediate predecessor survive; older cleaned
    assert names == {"sketch_v2", "sketch_v1"}


def test_kmv_fold_survives_checkpoint_reset(spark, tmp_path):
    """ADVICE r14: a stream restarted against an existing sketch_dir
    with a FRESH checkpoint resets batch_id to 0 — the fold installs
    sketch_v0 while numerically-higher dirs from the old run still
    exist. Number-ordered cleanup deleted the just-installed v0 and
    left CURRENT dangling; mtime ordering + the CURRENT exclusion must
    keep the reset run readable and foldable."""
    root = tmp_path / "kmv"
    fold = kmv_sketch_sink(str(root), ["k"], k=16)
    for i in range(4):  # old run: CURRENT -> sketch_v3, dirs v1..v3
        df = spark.range(i * 100, (i + 1) * 100).select(
            F.col("id").cast("string").alias("k")
        )
        fold(df, i)
    assert (root / "CURRENT").read_text() == "sketch_v3"

    fold2 = kmv_sketch_sink(str(root), ["k"], k=16)  # fresh checkpoint
    df_new = spark.range(400, 500).select(
        F.col("id").cast("string").alias("k")
    )
    fold2(df_new, 0)
    assert (root / "CURRENT").read_text() == "sketch_v0"
    assert (root / "sketch_v0").exists()
    want = sorted(
        r["kmv_hash"]
        for r in SK.kmv_sketch(
            spark.range(500).select(F.col("id").cast("string").alias("k")),
            ["k"],
            k=16,
        ).collect()
    )
    assert _stored(spark, root) == want
    # and the next fold still reads a live CURRENT
    fold2(df_new, 1)
    assert _stored(spark, root) == want


def test_kmv_empty_pointer_treated_as_missing(spark, tmp_path):
    """A power-loss-truncated CURRENT must not alias the root dir."""
    df = spark.range(100).select(F.col("id").cast("string").alias("k"))
    root = tmp_path / "kmv"
    fold = kmv_sketch_sink(str(root), ["k"], k=16)
    fold(df, 0)
    (root / "CURRENT").write_text("")  # simulate torn pointer write
    import pytest

    with pytest.raises(FileNotFoundError):
        read_kmv_sketch(spark, str(root))
    fold(df, 1)  # recovery: fold proceeds as a fresh start
    assert _stored(spark, root) == sorted(
        r["kmv_hash"] for r in SK.kmv_sketch(df, ["k"], k=16).collect()
    )


def test_streaming_digit_hist_matches_batch(spark, tmp_path):
    stream_dir = _stage_events(spark, tmp_path)
    batch_df = spark.read.parquet(str(stream_dir))
    schema = batch_df.schema
    stream = spark.readStream.schema(schema).parquet(str(stream_dir))

    from hive_scripts_spark.streaming.sketches import streaming_digit_hist

    out = streaming_digit_hist(stream, "value", digits=2)
    q = (
        out.writeStream.format("memory")
        .queryName("dh_stream_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(240), "stream did not finish in time"
    want = {
        (r["sign"], r["decade"], r["sub"]): r["cnt"]
        for r in SK.digit_hist(batch_df, "value", digits=2).collect()
    }
    got = {
        (r["sign"], r["decade"], r["sub"]): r["cnt"]
        for r in spark.table("dh_stream_test").collect()
    }
    assert got == want and len(got) > 0


def test_kmv_fold_cleanup_tolerates_vanished_version_dir(spark, tmp_path):
    """r15 ADVICE: cleanup's sort key stats each globbed dir; a version
    dir deleted concurrently (manual cleanup, an external janitor)
    between the glob and the stat must not fail the fold after the
    pointer is already installed. A dangling symlink named like a
    version dir makes glob see an entry whose stat raises — exactly
    the vanished-dir race."""
    root = tmp_path / "kmv"
    fold = kmv_sketch_sink(str(root), ["k"], k=16, keep=2)
    df = spark.range(100).select(F.col("id").cast("string").alias("k"))
    fold(df, 0)
    (root / "sketch_v99").symlink_to(root / "no_such_dir")
    fold(df, 1)  # must not raise; vanished entry sorts oldest, rmtree no-ops
    assert (root / "CURRENT").read_text() == "sketch_v1"
    want = sorted(
        r["kmv_hash"] for r in SK.kmv_sketch(df, ["k"], k=16).collect()
    )
    assert _stored(spark, root) == want
