"""Streaming event analytics: tumbling-window aggregation with watermarks.

Batch/stream parity: :func:`hourly_event_counts` produces the same result
schema as the batch ``x_events_hourly`` query, so the correctness test
runs the stream with ``availableNow`` over the same files and asserts
equality against the batch plan — the Structured Streaming contract
(incremental execution of the same logical plan) makes this exact.

Scale posture: state is bounded by the watermark (late rows beyond
``delay`` are dropped deterministically); the shuffle is keyed on
(window, event_type) with map-side partial aggregation, identical to the
batch plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_scripts_spark.sources.events import event_stream


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over the events parquet directory.

    Schema is probed from a batch read of the directory (not hard-coded)
    and ``ts`` is normalized by the shared dtype-driven path, so the
    stream survives writer representation changes exactly like batch —
    see :mod:`hive_scripts_spark.sources.events`.
    """
    return event_stream(spark, path)


def _windowed_event_counts(
    events: DataFrame, duration: str, slide: str | None, watermark: str
) -> DataFrame:
    """Shared body of the tumbling/sliding count twins: one place owns
    the decimal(18,2) value-sum contract and the output schema the
    batch-parity tests pin."""
    w = (
        F.window("ts", duration)
        if slide is None
        else F.window("ts", duration, slide)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "total_value"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def hourly_event_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour counts + value sums per event type, late data
    bounded by ``watermark``."""
    return _windowed_event_counts(events, "1 hour", None, watermark)


def sliding_event_counts(
    events: DataFrame, watermark: str = "3 hours"
) -> DataFrame:
    """Sliding 2-hour/1-hour counts + value sums per event type — the
    streaming twin of `x_events_sliding` (same expression; exact batch
    parity pytest-pinned). The watermark delay bounds LATENESS only — a
    window finalizes for append mode when the watermark passes its END,
    whatever the delay — but each event lives in two open windows, so
    the sliding form holds 2× the tumbling form's state at any delay."""
    return _windowed_event_counts(events, "2 hours", "1 hour", watermark)


def streaming_partition_counts(
    events: DataFrame, partition_col: str = "event_type", watermark: str = "2 hours"
) -> DataFrame:
    """Micro-batch twin of UC#1's per-partition counts: running row counts
    per partition value over the stream (append-mode windowless counts
    require complete/update mode; windowed form keeps append semantics)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col(partition_col))
        .agg(F.count(F.lit(1)).alias("row_count"))
        .select(
            F.col("w.start").alias("window_start"), partition_col, "row_count"
        )
    )


def watermark_drop_count(query) -> int:
    """Total input rows dropped as too-late by the watermark across a
    (finished or running) streaming query's recorded progress — the
    observability counter a production stream MUST alert on: silent
    late-drops are data loss that no output check can see (the rows
    simply never appear in any window).

    Reads ``numRowsDroppedByWatermark`` from every state operator in
    every recent progress event. Spark keeps the last ~100 progress
    events; for a long-running stream, poll and accumulate (or attach a
    ``StreamingQueryListener``) rather than calling once at the end.

    Granularity caveat: the counter is measured AT the state operator,
    i.e. after map-side partial aggregation — for a windowed agg it
    counts dropped (window, key) partial-group rows, not raw input
    events (pytest pins this: 200 late events → 174 dropped partial
    groups). Treat it as a nonzero-late-data ALARM and a lower bound,
    not an exact event count; an exact count needs an `observe()`
    counter on the pre-aggregation stream.
    """
    total = 0
    for progress in query.recentProgress:
        for op in progress.get("stateOperators", []):
            total += op.get("numRowsDroppedByWatermark", 0)
    return total
