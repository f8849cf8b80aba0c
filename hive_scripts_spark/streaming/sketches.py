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
  sketch each micro-batch, merge with the stored sketch, write a NEW
  version directory, then atomically install it via a ``CURRENT``
  pointer file (``os.replace`` — file renames are atomic on POSIX;
  directory swaps are not, and a two-rename directory swap has crash
  windows that lose or wedge the state). The KMV merge is a
  distinct-union — IDEMPOTENT — so at-least-once delivery gives
  exactly-once sketch state with no checkpoint coordination: a crash
  at ANY point leaves either the old pointer (replay re-merges — a
  no-op on already-folded data) or the new pointer (replay re-folds
  into a suffixed sibling — a no-op merge for identical content, an
  additive fold for a source that re-delivers different rows);
  stale version dirs are garbage, never corruption. (Count-min does
  NOT have the idempotence property — replays double-count — which is
  why it rides the engine's stateful agg and KMV rides foreachBatch.)
  Read the live sketch with :func:`read_kmv_sketch`.

Batch/stream parity is pinned in ``tests/test_streaming_sketches.py``:
the streamed sketch equals the batch build over the same files,
bit-for-bit (the merge-exactness contract from ``test_sketches.py``
carried across the micro-batch boundary).
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from hive_scripts_spark.operators.sketches import (
    countmin_build,
    digit_hist,
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


def _current_version(root: Path) -> str | None:
    pointer = root / "CURRENT"
    if not pointer.exists():
        return None
    # a power-loss-truncated pointer reads as "": treat it like the
    # missing pointer (root / "" would alias the root dir and wedge
    # every subsequent read with a schema-inference error)
    version = pointer.read_text().strip()
    return version or None


def read_kmv_sketch(spark: SparkSession, sketch_dir: str) -> DataFrame:
    """Read the live sketch written by :func:`kmv_sketch_sink`:
    resolve the ``CURRENT`` pointer to its version directory. Raises
    ``FileNotFoundError`` before the first fold commits."""
    root = Path(sketch_dir)
    version = _current_version(root)
    if version is None:
        raise FileNotFoundError(
            f"no committed sketch at {sketch_dir} (missing CURRENT pointer)"
        )
    return spark.read.parquet(str(root / version))


def streaming_digit_hist(
    events: DataFrame, value_col: str, digits: int = 2, scale: int = 6
) -> DataFrame:
    """Digit histogram over a stream: like count-min, the construction
    is a pure keyed sum, so Structured Streaming incrementalizes it
    with state bounded at the bucket count (≤ ~90·decades rows) —
    continuous quantile monitoring over an ingest stream. Run with
    ``outputMode("complete")`` and feed the result to
    ``digit_hist_quantiles``. Both (digits, scale) pass through —
    merged sketches must share them."""
    return digit_hist(events, value_col, digits=digits, scale=scale)


def kmv_sketch_sink(
    sketch_dir: str,
    cols: Sequence[str],
    k: int = 256,
    keep: int = 3,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` callable: fold each micro-batch into the KMV
    sketch stored under ``sketch_dir`` (version dirs + a ``CURRENT``
    pointer file — read with :func:`read_kmv_sketch`).

    Per batch: sketch the batch (raw rows never shuffle — the
    per-partition Arrow top-k), merge with the current k-row sketch,
    write ``sketch_v{batch_id}``, atomically install it by
    ``os.replace`` on the fsynced pointer file, then best-effort clean
    all but the ``keep`` newest versions. Crash-safe by construction:
    a crash before the pointer install leaves the old pointer (the
    replayed batch re-merges — a no-op, the merge is a distinct
    union); a crash after it makes the replay re-fold into a suffixed
    sibling version — a no-op merge for identical replay content, a
    correct ADDITIVE fold when a non-replayable source re-delivers
    different rows under the same batch id (a skip would lose them);
    stale version dirs are garbage, never corruption; a power-loss-
    truncated pointer reads as missing, and
    the pointer bytes + directory entry are fsynced before the swap so
    the installed pointer never outlives its data on disk. A restart
    with a FRESH checkpoint (batch_id reset to 0 against an existing
    ``sketch_dir``) is also safe: replayed rows re-merge as a no-op
    (distinct union) and new rows fold in even when the reset batch id
    collides with an old run's committed version (the suffixed-sibling
    path above — r15 review), and cleanup orders versions by mtime
    with the CURRENT-named version excluded outright, so the reset's
    low-numbered-but-newest version is never deleted from under the
    pointer (ADVICE r14).

    Reader contract: :func:`read_kmv_sketch` resolves the pointer to a
    version directory that survives the next ``keep - 1`` folds —
    readers must finish within that many micro-batch intervals (size
    ``keep`` to the slowest consumer; each version is ≤ k rows, so
    retention is KB). The live sketch stays ≤ k rows forever — state
    does not grow with the stream."""
    if keep < 2:
        raise ValueError(f"keep must be >= 2 (current + predecessor): {keep}")

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        root = Path(sketch_dir)
        root.mkdir(parents=True, exist_ok=True)
        version = f"sketch_v{batch_id}"
        current = _current_version(root)
        if current == version or (root / version).exists():
            # the natural name is the live version OR an existing dir:
            # a replay after the pointer installed (same data — the
            # merge below is then a no-op, KMV merge is a distinct
            # union), a fresh-checkpoint restart whose batch ids
            # collide with an old run's committed versions and carry
            # NEW rows (skipping would silently drop them forever —
            # r15 review), or a partial dir from a crash before
            # install. Fold into a fresh suffixed sibling in every
            # case: NO existing directory is ever rewritten in place,
            # so a reader that resolved CURRENT keeps its directory
            # for the full documented keep-window (in-place overwrite
            # would yank it after as little as one fold — second r15
            # review pass), and Spark never overwrites the directory
            # it is reading the current sketch from.
            n = 1
            while (
                current == f"{version}_r{n}"
                or (root / f"{version}_r{n}").exists()
            ):
                n += 1
            version = f"{version}_r{n}"
        new = kmv_sketch(batch_df, cols, k=k)
        if current is not None:
            merged = kmv_merge(
                [spark.read.parquet(str(root / current)), new], k=k
            )
        else:
            merged = new
        merged.write.mode("overwrite").parquet(str(root / version))
        # atomic install: rename over an existing FILE is atomic on
        # POSIX (directory swaps are not); fsync the tmp bytes and the
        # directory entry so a kernel crash cannot surface an empty or
        # dangling pointer after the rename is visible
        tmp = root / f"CURRENT.tmp.{batch_id}"
        with open(tmp, "w") as fh:
            fh.write(version)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, root / "CURRENT")
        dir_fd = os.open(root, os.O_RDONLY)
        try:
            os.fsync(dir_fd)
        finally:
            os.close(dir_fd)
        # cleanup orders by mtime, not version number, and never touches
        # the version CURRENT names (re-read, not assumed): a stream
        # restarted against an existing sketch_dir with a FRESH
        # checkpoint resets batch_id to 0, so the just-installed
        # sketch_v0 is the NUMERICALLY smallest dir while being the
        # newest — number-ordered cleanup would delete it and leave
        # CURRENT dangling (ADVICE r14). mtime makes "newest" survive
        # resets; the CURRENT exclusion is the hard guarantee either
        # way. Replayed data re-merging after a reset is a no-op — the
        # KMV merge is a distinct union.
        installed = _current_version(root)

        def vkey(d):
            # numeric-aware tie-break for mtime ties (coarse-mtime
            # filesystems): sketch_v10 must sort after sketch_v2, and
            # suffixed retry versions after their base; foreign dir
            # names sort first (oldest) rather than crashing cleanup.
            # A checkpoint reset makes version numbers non-monotonic
            # vs recency, so ties CAN still mis-order — which is why
            # the keep>=2 reader contract (current + immediate
            # predecessor) is enforced by the explicit protected set
            # below, never by the ordering.
            tail = d.name.rsplit("v", 1)[1]
            base, _, retry = tail.partition("_r")
            try:
                return (int(base), int(retry or 0))
            except ValueError:
                return (-1, -1)

        # `current` is the PRE-fold pointer = the immediate
        # predecessor a reader may still be scanning; protecting it
        # outright (third r15 review pass) makes the documented
        # "survives the next fold" window hold even when coarse
        # mtimes + a reset mis-order the sort.
        protected = {installed, current}

        def mkey(d):
            # a version dir deleted concurrently (manual cleanup, an
            # external janitor) between the glob and this stat must
            # not fail the fold after the pointer is already
            # installed (r15 ADVICE) — treat a vanished dir as oldest
            # and let the rmtree below no-op on it, the same
            # tolerance vkey has for foreign names
            try:
                return d.stat().st_mtime
            except OSError:
                return float("-inf")

        versions = sorted(
            (d for d in root.glob("sketch_v*")),
            key=lambda d: (mkey(d), vkey(d)),
        )
        for d in versions[:-keep]:
            if d.name not in protected:
                shutil.rmtree(d, ignore_errors=True)

    return fold
