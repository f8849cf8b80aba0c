"""Streaming twins of the mergeable sketches (continuous corpus
statistics over an ingest stream).

Two shapes, matching the two sketch algebras:

* **Count-min** streams natively: :func:`operators.sketches.
  countmin_build` is explode → keyed sum, which Structured Streaming
  runs incrementally with state bounded at ``depth × width`` counters
  REGARDLESS of stream length — the canonical streaming-sketch shape.
  Exactly-once comes from the engine's stateful-aggregation
  checkpointing; :func:`streaming_countmin` is the documented wrapper.
* **KMV** folds through ``foreachBatch`` (:func:`kmv_sketch_sink`):
  sketch each micro-batch, merge with the stored sketch, staged-write
  + rename swap. The KMV merge is a distinct-union — IDEMPOTENT — so
  replaying a micro-batch after a crash changes nothing: at-least-once
  delivery gives exactly-once sketch state with no checkpoint
  coordination. (Count-min does NOT have this property — replays
  double-count — which is why it rides the engine's stateful agg and
  KMV rides foreachBatch.)

Batch/stream parity is pinned in ``tests/test_streaming_sketches.py``:
the streamed sketch equals the batch build over the same files,
bit-for-bit (the merge-exactness contract from ``test_sketches.py``
carried across the micro-batch boundary).
"""

from __future__ import annotations

import shutil
from pathlib import Path
from typing import Callable, Sequence

from pyspark.sql import DataFrame

from hive_scripts_spark.operators.sketches import (
    countmin_build,
    kmv_merge,
    kmv_sketch,
)


def streaming_countmin(
    events: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-min over a stream: the batch construction verbatim —
    Structured Streaming incrementalizes the keyed sum with bounded
    state (≤ depth × width counters). Run with ``outputMode("complete")``
    (the sketch is small by construction) or ``"update"``."""
    return countmin_build(events, key_col, depth=depth, width=width)


def kmv_sketch_sink(
    sketch_dir: str, cols: Sequence[str], k: int = 256
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` callable: fold each micro-batch into the KMV
    sketch stored at ``sketch_dir/sketch`` (the ``sketch`` CLI layout).

    Per batch: sketch the batch (raw rows never shuffle — the
    per-partition Arrow top-k), merge with the stored k-row sketch,
    write to a staging dir, swap by rename. Idempotent under replay:
    re-merging an already-folded batch is a no-op (distinct union), so
    streaming retries cannot corrupt the sketch. The stored sketch
    stays ≤ k rows forever — state does not grow with the stream."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        root = Path(sketch_dir)
        root.mkdir(parents=True, exist_ok=True)
        cur = root / "sketch"
        new = kmv_sketch(batch_df, cols, k=k)
        if cur.exists():
            merged = kmv_merge([spark.read.parquet(str(cur)), new], k=k)
        else:
            merged = new
        stage = root / f"sketch_stage_{batch_id}"
        merged.write.mode("overwrite").parquet(str(stage))
        # swap: the reader only ever sees a complete directory
        old = root / f"sketch_old_{batch_id}"
        if cur.exists():
            cur.rename(old)
        stage.rename(cur)
        shutil.rmtree(old, ignore_errors=True)

    return fold
