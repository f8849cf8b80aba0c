"""Streaming soak: RocksDB state store + checkpoint kill/restore with
exactly-once sink checks (COVERAGE.md "Post-queue roadmap" item 3,
first version, pulled forward to r18).

What a single-batch parity row cannot grade is the RECOVERY contract:
a stateful stream that dies after writing a batch's output but before
committing its checkpoint must, on restart, replay that batch against
the pre-batch state version and leave the sink exactly once. This
soak runs that scenario end-to-end on BOTH of the repo's stateful
operators, each through the same protocol:

1. slice ``events`` (sf0.01, 10k rows) into 8 parquet files; stage the
   first 4 as the stream source;
2. run the operator (``applyInPandasWithState``) on the **RocksDB
   provider with changelog checkpointing** (`enable_rocksdb_state`),
   sinking via the idempotent ``batch_id=N`` overwrite recipe
   (``streaming/curation.py``'s retry contract), one micro-batch per
   file (``maxFilesPerTrigger=1`` + ``availableNow``);
3. CRASH SIMULATION: after the 4-batch phase completes, delete the
   LAST entry in ``checkpoint/commits`` — the exact
   written-but-uncommitted state a mid-write kill leaves behind;
4. stage the remaining 4 files and restart from the same checkpoint:
   Spark must re-execute the uncommitted batch against its pre-batch
   RocksDB state version (changelog replay — the artifact records
   ``rocksdbNumReplayChangelogFiles`` > 0 on exactly that batch), the
   idempotent sink must absorb the double write, then the new batches
   stream through;
5. VERIFY exactly-once against the batch twin.

Scenarios:

* **totals** — :func:`streaming.stateful.running_user_totals`
  (update mode, accumulating state): per-user latest sink rows
  (``max_by(_, batch_id)``) must equal the one-shot batch aggregate
  over all 8 slices. Detects double-counting from the replayed batch
  and lost accumulator state from a bad restore.
* **dedup** — :func:`streaming.stateful.streaming_dedup` (append
  mode, seen-key state) over slices where every batch k ≥ 1 ALSO
  re-injects ~1/7 of batch k−1's rows (planted cross-batch replays):
  the union of all sink partitions must equal exactly one row per
  distinct ``event_id``. This is the sharp edge of the restore
  contract: if the restore retained the FAILED attempt's state
  version instead of the pre-batch one, the replayed batch would see
  all its keys as already-seen, emit ZERO rows, and the idempotent
  overwrite would wipe that batch's rows from the sink — caught by
  the equality.

Emits one JSON line per batch (phase, batchId, input rows, state rows
updated/total, RocksDB pinned memory / SST / bytes-written /
changelog-files-replayed) and writes the committed artifact (default
``SOAK_r18.json``). Scratch lives under ``.scratch/`` and is deleted
on success.

Usage: python tools/stream_soak.py [--sf-dir /root/testdata/sf0.01]
           [--out SOAK_r18.json] [--slices 8] [--crash-after 4]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def _pick_metric(cm: dict, *substrings: str):
    """First custom metric whose (lowercased) name contains every
    substring — metric names vary across Spark versions, so match by
    shape instead of pinning one spelling."""
    for k in sorted(cm):
        kl = k.lower()
        if all(s in kl for s in substrings):
            return cm[k]
    return None


def _progress_row(scenario: str, phase: str, p: dict) -> dict:
    ops = p.get("stateOperators") or [{}]
    op = ops[0]
    cm = op.get("customMetrics") or {}
    return {
        "scenario": scenario,
        "phase": phase,
        "batch_id": p.get("batchId"),
        "input_rows": p.get("numInputRows"),
        "state_rows_updated": op.get("numRowsUpdated"),
        "state_rows_total": op.get("numRowsTotal"),
        "rocksdb_pinned_mem_bytes": _pick_metric(cm, "rocksdb", "memoryusage"),
        "rocksdb_sst_bytes": _pick_metric(cm, "rocksdb", "sstfile"),
        "rocksdb_bytes_written": cm.get("rocksdbTotalBytesWritten"),
        # > 0 on the post-crash batch = state restored by CHANGELOG
        # REPLAY, the mechanism changelogCheckpointing.enabled buys
        "rocksdb_replay_changelog_files": cm.get(
            "rocksdbNumReplayChangelogFiles"
        ),
        "rocksdb_engaged": any(k.lower().startswith("rocksdb") for k in cm),
    }


def _run_phase(spark, scenario, phase, op, output_mode, src, ckpt, sink,
               schema, timeout_s=300):
    """One availableNow pass: every staged file not yet committed runs
    as its own micro-batch through ``op`` into the idempotent
    batch_id=N sink. Returns the per-batch progress rows."""
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("path", src)
        .option("maxFilesPerTrigger", 1)
        .load()
    )

    def write_batch(batch_df, batch_id):
        # the idempotent retry recipe (streaming/curation.py): replayed
        # batch ids OVERWRITE their own partition, never append
        batch_df.write.mode("overwrite").parquet(f"{sink}/batch_id={batch_id}")

    q = (
        op(raw)
        .writeStream.foreachBatch(write_batch)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    # fail loudly on a hung phase (ADVICE r18): awaitTermination(t)
    # returns False on timeout with the query STILL RUNNING — letting
    # the caller then delete its commit marker and restart turns a hang
    # into a confusing concurrent-checkpoint failure instead of a clear
    # timeout error
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"stream_soak {scenario}/{phase}: availableNow query did "
            f"not terminate within {timeout_s}s"
        )
    rows = [
        _progress_row(scenario, phase, p)
        for p in q.recentProgress
        if (p.get("numInputRows") or 0) > 0 or p.get("stateOperators")
    ]
    for r in rows:
        print(json.dumps(r), flush=True)
    return rows


def _write_slice(df, dest_dir: Path, name: str) -> str:
    stage = dest_dir / "_stage"
    df.coalesce(1).write.mode("overwrite").parquet(str(stage))
    (part,) = glob.glob(str(stage / "*.parquet"))
    final = dest_dir / name
    shutil.move(part, final)
    shutil.rmtree(stage)
    return str(final)


def _soak_scenario(spark, scratch: Path, scenario: str, staged: list[str],
                   op, output_mode: str, crash_after: int):
    """Phase A → delete last commit → phase B, returning telemetry +
    the replayed batch id. The caller verifies the sink."""
    base = scratch / scenario
    (base / "src").mkdir(parents=True)
    src, ckpt, sink = (str(base / "src"), str(base / "ckpt"),
                       str(base / "sink"))
    schema = spark.read.parquet(staged[0]).schema

    for k in range(crash_after):
        shutil.copy(staged[k], f"{src}/batch-{k}.parquet")
    rows_a = _run_phase(
        spark, scenario, "A", op, output_mode, src, ckpt, sink, schema
    )

    commits = sorted(
        (f for f in os.listdir(f"{ckpt}/commits") if not f.startswith(".")),
        key=int,
    )
    victim = commits[-1]
    os.remove(f"{ckpt}/commits/{victim}")
    crc = f"{ckpt}/commits/.{victim}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    print(json.dumps({"scenario": scenario,
                      "crash": f"removed commit {victim}"}), flush=True)

    for k in range(crash_after, len(staged)):
        shutil.copy(staged[k], f"{src}/batch-{k}.parquet")
    rows_b = _run_phase(
        spark, scenario, "B", op, output_mode, src, ckpt, sink, schema
    )

    replayed = int(victim)
    a_ids = {r["batch_id"] for r in rows_a}
    b_ids = {r["batch_id"] for r in rows_b}
    assert replayed in a_ids and replayed in b_ids, (
        f"{scenario}: batch {replayed} was not replayed "
        f"(A ran {sorted(a_ids)}, B ran {sorted(b_ids)})"
    )
    rows = rows_a + rows_b
    assert all(r["rocksdb_engaged"] for r in rows), (
        f"{scenario}: RocksDB provider not engaged on every batch"
    )
    return rows, replayed, sink


def _assert_frames_equal(got, expected, label):
    diff = got.exceptAll(expected).unionAll(expected.exceptAll(got))
    n_diff = diff.count()
    assert n_diff == 0, (
        f"{label}: exactly-once violated - {n_diff} differing rows "
        f"(sample: {[tuple(r) for r in diff.limit(5).collect()]})"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="SOAK_r18.json")
    ap.add_argument("--slices", type=int, default=8)
    ap.add_argument("--crash-after", type=int, default=4)
    args = ap.parse_args()

    from hive_scripts_spark.session import get_spark
    from hive_scripts_spark.streaming.stateful import (
        enable_rocksdb_state,
        running_user_totals,
        streaming_dedup,
    )

    spark = get_spark("stream_soak")
    spark.sparkContext.setLogLevel("ERROR")
    enable_rocksdb_state(spark)

    scratch = Path(__file__).resolve().parents[1] / ".scratch" / "stream_soak"
    shutil.rmtree(scratch, ignore_errors=True)
    slices_dir = scratch / "slices"
    slices_dir.mkdir(parents=True)

    n_slices = args.slices
    ev = spark.read.parquet(f"{args.sf_dir}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    sl = [ev.where(F.col("event_id") % n_slices == k) for k in range(n_slices)]
    clean: list[str] = []
    replayed_files: list[str] = []
    for k in range(n_slices):
        clean.append(_write_slice(sl[k], slices_dir, f"clean-{k}.parquet"))
        # dedup corpus: batch k >= 1 re-injects ~1/7 of batch k-1's rows
        # (identical copies - the cross-batch replays seen-key state
        # exists to drop)
        planted = sl[k]
        if k > 0:
            planted = planted.unionByName(
                sl[k - 1].where(F.col("event_id") % 7 == 0)
            )
        replayed_files.append(
            _write_slice(planted, slices_dir, f"replay-{k}.parquet")
        )

    t0 = time.perf_counter()
    scenarios = []

    # ---- scenario 1: accumulating state (running totals, update) -----
    rows, replayed, sink = _soak_scenario(
        spark, scratch, "totals", clean, running_user_totals, "update",
        args.crash_after,
    )
    got = (
        spark.read.parquet(sink)
        .groupBy("user_id")
        .agg(
            F.max_by(
                F.struct("n_events", "total_value"), F.col("batch_id")
            ).alias("last")
        )
        .select("user_id", "last.n_events", "last.total_value")
    )
    expected = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    _assert_frames_equal(got, expected, "totals")
    n_users = expected.count()
    print(json.dumps({"scenario": "totals", "verified": "exactly_once",
                      "users": n_users, "replayed_batch": replayed}),
          flush=True)
    scenarios.append({"scenario": "totals", "users": n_users,
                      "replayed_batch": replayed, "batches": rows})

    # ---- scenario 2: seen-key state (dedup, append) -------------------
    rows, replayed, sink = _soak_scenario(
        spark, scratch, "dedup", replayed_files, streaming_dedup, "append",
        args.crash_after,
    )
    got = spark.read.parquet(sink).select(
        "event_id", "user_id", "event_type", "value"
    )
    expected = ev.select("event_id", "user_id", "event_type", "value")
    _assert_frames_equal(got, expected, "dedup")
    n_events = expected.count()
    n_planted = sum(
        spark.read.parquet(f).count() for f in replayed_files
    ) - n_events
    print(json.dumps({"scenario": "dedup", "verified": "exactly_once",
                      "events": n_events, "planted_replays": n_planted,
                      "replayed_batch": replayed}), flush=True)
    scenarios.append({"scenario": "dedup", "events": n_events,
                      "planted_replays": n_planted,
                      "replayed_batch": replayed, "batches": rows})

    soak_s = round(time.perf_counter() - t0, 2)
    summary = {
        "round": 18,
        "sf_dir": args.sf_dir,
        "slices": n_slices,
        "crash_after_batch": args.crash_after - 1,
        "soak_s": soak_s,
        "note": (
            "Kill/restore soak on BOTH stateful operators @ RocksDB "
            "state store with changelog checkpointing: phase A runs the "
            f"first {args.crash_after} slices as micro-batches, the "
            "last commit marker is deleted (written-but-uncommitted "
            "crash), phase B restores from the checkpoint, REPLAYS "
            "that batch against its pre-batch state version "
            "(rocksdb_replay_changelog_files > 0 on exactly that "
            "batch), streams the remaining slices, and the sink equals "
            "the batch twin exactly. totals = accumulating state "
            "(double-count detector); dedup = seen-key state over "
            "planted cross-batch replays (a restore that kept the "
            "failed attempt's state would emit zero rows on replay and "
            "wipe the batch's sink partition - caught by the equality)."
        ),
        "scenarios": scenarios,
    }
    Path(args.out).write_text(json.dumps(summary, indent=1) + "\n")
    print(json.dumps({"summary_written": args.out, "soak_s": soak_s}))
    shutil.rmtree(scratch, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
