"""Streaming soak: RocksDB state store + checkpoint kill/restore with
an exactly-once sink check (COVERAGE.md "Post-queue roadmap" item 3,
first version, pulled forward to r18).

What a single-batch parity row cannot grade is the RECOVERY contract:
a stateful stream that dies after writing a batch's output but before
committing its checkpoint must, on restart, replay that batch against
the pre-batch state version and leave the sink exactly once. This
soak runs that scenario end-to-end on the repo's own operators:

1. slice ``events`` (sf0.01, 10k rows) into 8 parquet files; stage the
   first 4 as the stream source;
2. run :func:`streaming.stateful.running_user_totals` (update-mode
   ``applyInPandasWithState``) on the **RocksDB provider with
   changelog checkpointing** (`enable_rocksdb_state`), sinking via the
   idempotent ``batch_id=N`` overwrite recipe
   (``streaming/curation.py``'s retry contract), one micro-batch per
   file (``maxFilesPerTrigger=1`` + ``availableNow``);
3. CRASH SIMULATION: after the 4-batch phase completes, delete the
   LAST entry in ``checkpoint/commits`` — the exact
   written-but-uncommitted state a mid-write kill leaves behind;
4. stage the remaining 4 files and restart from the same checkpoint:
   Spark must re-execute the uncommitted batch against its pre-batch
   RocksDB state version (changelog replay), the idempotent sink must
   absorb the double write, then the 4 new batches stream through;
5. VERIFY: the per-user latest sink rows (``max_by(_, batch_id)``
   across all ``batch_id=N`` partitions) must equal the one-shot batch
   aggregate over all 8 slices — any double-count from the replayed
   batch, lost state from a bad restore, or missed batch breaks the
   equality. Also asserts RocksDB custom metrics are present in every
   progress entry (the provider really engaged) and that the replayed
   batch id was executed in BOTH phases.

Emits one JSON line per batch (phase, batchId, input rows, state rows
updated/total, RocksDB memory + SST bytes) and writes the committed
artifact (default ``SOAK_r18.json``). Scratch lives under ``.scratch/``
and is deleted on success.

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


def _progress_row(phase: str, p: dict) -> dict:
    ops = p.get("stateOperators") or [{}]
    op = ops[0]
    cm = op.get("customMetrics") or {}
    return {
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


def _run_phase(spark, phase, src, ckpt, sink, schema, timeout_s=300):
    """One availableNow pass: every staged file not yet committed runs
    as its own micro-batch through running_user_totals into the
    idempotent batch_id=N sink. Returns the per-batch progress rows."""
    from hive_scripts_spark.streaming.stateful import running_user_totals

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
        running_user_totals(raw)
        .writeStream.foreachBatch(write_batch)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    rows = [_progress_row(phase, p) for p in q.recentProgress
            if (p.get("numInputRows") or 0) > 0 or p.get("stateOperators")]
    for r in rows:
        print(json.dumps(r), flush=True)
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="SOAK_r18.json")
    ap.add_argument("--slices", type=int, default=8)
    ap.add_argument("--crash-after", type=int, default=4)
    args = ap.parse_args()

    from hive_scripts_spark.session import get_spark
    from hive_scripts_spark.streaming.stateful import enable_rocksdb_state

    spark = get_spark("stream_soak")
    spark.sparkContext.setLogLevel("ERROR")
    enable_rocksdb_state(spark)

    scratch = Path(__file__).resolve().parents[1] / ".scratch" / "stream_soak"
    shutil.rmtree(scratch, ignore_errors=True)
    (scratch / "src").mkdir(parents=True)
    src, ckpt, sink = (
        str(scratch / "src"),
        str(scratch / "ckpt"),
        str(scratch / "sink"),
    )

    ev = spark.read.parquet(f"{args.sf_dir}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    n_slices = args.slices
    staged: list[str] = []
    for k in range(n_slices):
        d = scratch / "stage" / f"s{k}"
        ev.where(F.col("event_id") % n_slices == k).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(d))
        (part,) = glob.glob(str(d / "*.parquet"))
        staged.append(part)
    schema = spark.read.parquet(str(scratch / "stage" / "s0")).schema

    t0 = time.perf_counter()
    # ---- phase A: first crash-after slices, 1 file = 1 micro-batch ----
    for k in range(args.crash_after):
        shutil.copy(staged[k], f"{src}/batch-{k}.parquet")
    rows_a = _run_phase(spark, "A", src, ckpt, sink, schema)

    # ---- crash simulation: last batch written but NOT committed -------
    commits = sorted(
        (f for f in os.listdir(f"{ckpt}/commits") if not f.startswith(".")),
        key=int,
    )
    victim = commits[-1]
    os.remove(f"{ckpt}/commits/{victim}")
    crc = f"{ckpt}/commits/.{victim}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    print(json.dumps({"crash": f"removed commit {victim}"}), flush=True)

    # ---- phase B: restore from checkpoint, replay + the rest ----------
    for k in range(args.crash_after, n_slices):
        shutil.copy(staged[k], f"{src}/batch-{k}.parquet")
    rows_b = _run_phase(spark, "B", src, ckpt, sink, schema)
    soak_s = round(time.perf_counter() - t0, 2)

    # ---- verify ------------------------------------------------------
    replayed = int(victim)
    a_ids = {r["batch_id"] for r in rows_a}
    b_ids = {r["batch_id"] for r in rows_b}
    assert replayed in a_ids and replayed in b_ids, (
        f"batch {replayed} was not replayed: phase A ran {sorted(a_ids)}, "
        f"phase B ran {sorted(b_ids)}"
    )
    engaged = [r for r in rows_a + rows_b if r["rocksdb_engaged"]]
    assert len(engaged) == len(rows_a) + len(rows_b), (
        "RocksDB provider not engaged on every batch"
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
    diff = got.exceptAll(expected).unionAll(expected.exceptAll(got))
    n_diff = diff.count()
    n_users = expected.count()
    assert n_diff == 0, (
        f"exactly-once violated: {n_diff} differing rows "
        f"(sample: {[tuple(r) for r in diff.limit(5).collect()]})"
    )
    print(
        json.dumps(
            {"verified": "exactly_once", "users": n_users,
             "replayed_batch": replayed, "soak_s": soak_s}
        ),
        flush=True,
    )

    summary = {
        "round": 18,
        "sf_dir": args.sf_dir,
        "slices": n_slices,
        "crash_after_batch": replayed,
        "users": n_users,
        "soak_s": soak_s,
        "note": (
            "Kill/restore soak on running_user_totals @ RocksDB state "
            "store with changelog checkpointing: phase A runs the first "
            f"{args.crash_after} slices as micro-batches, the last "
            "commit marker is deleted (written-but-uncommitted crash), "
            "phase B restores from the checkpoint, REPLAYS that batch "
            "against its pre-batch state version, streams the remaining "
            "slices, and the per-user latest sink rows equal the "
            "one-shot batch aggregate over all slices (idempotent "
            "batch_id=N overwrite sink absorbs the double write)."
        ),
        "batches": rows_a + rows_b,
    }
    Path(args.out).write_text(json.dumps(summary, indent=1) + "\n")
    print(json.dumps({"summary_written": args.out}))
    shutil.rmtree(scratch, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
