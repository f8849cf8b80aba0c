"""Regression guard for the kill/restore soak protocol
(``tools/stream_soak.py``, COVERAGE.md roadmap item 3): a trimmed
single-scenario run — 3 micro-batches of ``streaming_dedup`` with
planted cross-batch replays on the RocksDB store, crash after batch 1
(last commit marker deleted), restore + replay + finish, exact frame
equality against the batch twin.

The dedup scenario is the sharp edge on purpose: a restore that
retained the FAILED attempt's state version would see the replayed
batch's keys as already-seen, emit zero rows, and the idempotent
``batch_id=N`` overwrite would wipe that partition from the sink —
caught here by the equality, every CI run, in ~20 s. The full
two-scenario soak with telemetry stays the per-round tool artifact
(``SOAK_r{N}.json``).
"""

import importlib.util
from pathlib import Path

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

_spec = importlib.util.spec_from_file_location(
    "stream_soak",
    Path(__file__).resolve().parent.parent / "tools" / "stream_soak.py",
)
soak = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(soak)


def test_dedup_kill_restore_exactly_once(spark, tmp_path):
    from hive_scripts_spark.streaming.stateful import (
        enable_rocksdb_state,
        streaming_dedup,
    )

    # isolated session: the provider switch must not leak into other
    # streaming tests (same pattern as test_stateful_streaming's
    # rocksdb case)
    s = spark.newSession()
    enable_rocksdb_state(s)

    ev = s.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    n_slices = 3
    sl = [ev.where(F.col("event_id") % n_slices == k) for k in range(n_slices)]
    slices_dir = tmp_path / "slices"
    slices_dir.mkdir()
    staged = []
    for k in range(n_slices):
        planted = sl[k]
        if k > 0:  # cross-batch replays the seen-key state must drop
            planted = planted.unionByName(
                sl[k - 1].where(F.col("event_id") % 5 == 0)
            )
        staged.append(
            soak._write_slice(planted, slices_dir, f"replay-{k}.parquet")
        )

    scratch = tmp_path / "scratch"
    scratch.mkdir()
    rows, replayed, sink = soak._soak_scenario(
        s, scratch, "dedup", staged, streaming_dedup, "append",
        crash_after=2,
    )
    # the deleted commit was batch 1 and it ran in both phases
    assert replayed == 1
    phases = {(r["phase"], r["batch_id"]) for r in rows}
    assert ("A", 1) in phases and ("B", 1) in phases
    # changelog replay engaged on exactly the post-crash batch
    replay_files = {
        r["batch_id"]: r["rocksdb_replay_changelog_files"]
        for r in rows
        if r["phase"] == "B"
    }
    assert (replay_files.get(1) or 0) > 0

    got = s.read.parquet(sink).select(
        "event_id", "user_id", "event_type", "value"
    )
    expected = ev.select("event_id", "user_id", "event_type", "value")
    soak._assert_frames_equal(got, expected, "dedup")
    assert got.count() == expected.count() > 0
