"""Streaming count reconciliation — SURVEY §7 item 9, the micro-batch
variant of UC#1 (``verizon_automation_script.sh:104-183``'s count loop,
re-expressed over a live stream).

Shape: the source side is a stream of windowed per-partition counts
(:func:`hive_scripts_spark.streaming.windowed.streaming_partition_counts`);
the target side is a static (batch) count frame with the same keys. Each
micro-batch reconciles ONLY the windows the watermark has finalized —
``foreachBatch`` receives exactly those rows in append mode, so no
window is ever reconciled twice and none is reconciled early.

Scale posture: the stream side's state is bounded by the watermark; the
per-batch join touches O(finalized windows × partition values) rows —
tiny — and the target side is broadcast. The heavy work (counting) is
the streaming agg itself, map-side partial like its batch twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hive_scripts_spark.operators.reconcile import count_reconcile


def _spec(partition_col: str) -> F.Column:
    """Render (window_start, partition value) as a reference-style
    partition spec string, e.g. ``window_start=2024-01-01 00:00:00/
    event_type=click`` (multi-level spec per SURVEY §2.8.5)."""
    return F.concat_ws(
        "/",
        F.concat(F.lit("window_start="), F.col("window_start").cast("string")),
        F.concat(F.lit(f"{partition_col}="), F.col(partition_col).cast("string")),
    )


def as_count_frame(
    counts: DataFrame, partition_col: str, table_name: str = "events"
) -> DataFrame:
    """Lift a ``(window_start, <partition_col>, row_count)`` frame into the
    ``count_reconcile`` contract: ``(table_name, partition_spec,
    row_count)``."""
    return counts.select(
        F.lit(table_name).alias("table_name"),
        _spec(partition_col).alias("partition_spec"),
        F.col("row_count"),
    )


def reconcile_count_frames(src: DataFrame, tgt: DataFrame) -> DataFrame:
    """The per-micro-batch reconcile body, usable on batch frames too.

    Both inputs are in the ``count_reconcile`` contract ``(table_name,
    partition_spec, row_count)``. The target is restricted to the
    source's keys (leftsemi on a broadcast of the O(finalized windows)
    key set) before the full-outer reconcile — in streaming the source
    batch holds only watermark-finalized windows, so unfinalized windows
    must not surface as phantom ``target_only`` rows. The batch face
    (``x_stream_reconcile_batch``) runs this exact function, so the
    driver row grades the same code path ``foreachBatch`` executes.
    """
    keys = src.select("table_name", "partition_spec")
    tgt_batch = tgt.join(
        F.broadcast(keys), ["table_name", "partition_spec"], "leftsemi"
    )
    return count_reconcile(src, tgt_batch)


def streaming_count_reconcile(
    target_counts: DataFrame,
    partition_col: str = "event_type",
    table_name: str = "events",
    on_batch: Callable[[DataFrame, int], None] | None = None,
):
    """Reconcile streaming micro-batches of a count frame against a
    static target.

    ``target_counts``: static ``(window_start, <partition_col>,
    row_count)`` frame (the "other side" — e.g. the migration target's
    counts). The streaming side arrives per micro-batch via the
    returned ``foreachBatch`` handler (append mode —
    watermark-finalized windows only), so no stream frame is passed
    here: the handler only ever sees ``batch_df``.

    Returns a function suitable for ``writeStream.foreachBatch``; if
    ``on_batch`` is given it is invoked with ``(reconciled_df, batch_id)``
    per micro-batch (sink the frame, alert on mismatches, …).

    The target is restricted to the micro-batch's finalized keys by the
    inner/semi structure of the join itself: a window absent from the
    batch simply contributes no rows, so unfinalized windows never show
    up as phantom ``target_only`` rows.
    """
    tgt = as_count_frame(target_counts, partition_col, table_name)

    def reconcile_batch(batch_df: DataFrame, batch_id: int) -> None:
        src = as_count_frame(batch_df, partition_col, table_name)
        reconciled = reconcile_count_frames(src, tgt)
        if on_batch is not None:
            on_batch(reconciled, batch_id)

    return reconcile_batch


def reconcile_parquet_sink(out_dir: str):
    """Idempotent ``on_batch`` sink: each micro-batch's reconcile frame
    lands in its own ``batch_id=N/`` parquet directory via overwrite.

    This is the standard exactly-once recipe for ``foreachBatch``:
    Structured Streaming guarantees at-least-once invocation per batch,
    so a retried batch re-executes the sink — overwriting the batch's
    OWN directory makes the retry a no-op-equivalent instead of an
    append-duplicate, and never touches other batches' output. Readers
    get a Hive-partitioned result table (``spark.read.parquet(out_dir)``
    with ``batch_id`` as a column); downstream dedup or compaction is
    unnecessary by construction.
    """

    def on_batch(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    return on_batch
