"""Batch gap-sessionization with an optional time-chunked escalation
path for pathologically hot users.

The default form is the lag + running-sum window chain the graded
``x_events_sessionize`` query has always run (reference parity:
``verizon_automation_script.sh`` has no session concept; this is part
of the LLM-pipeline extension surface). Its one scale risk, measured
in PLANS.md ("1M hot-key probes r12"): the ``user_id`` window puts a
user's ENTIRE event stream in a single sort partition — fine at 300k
events/user (1.40× clean), a straggler for a ~100M-event bot user.

``chunk_hours`` is the escalation knob (VERDICT r12 item 6 — formerly
a prose note, now an implementation): events first sessionize inside
``(user_id, time-chunk)`` windows — a hot user's sort shrinks by the
chunk count — then only each chunk's FIRST and LAST session can merge
across chunk boundaries (an interior session has same-chunk
neighbours already proven > gap away on both sides), so the per-user
stitch window runs over O(2 × chunks) session rows instead of O(N)
event rows, and the final per-user renumber window runs over session
rows (≪ event rows whenever sessions hold more than one event).
Output is BIT-IDENTICAL to the single-window form at any
``chunk_hours`` — pinned by ``tests/test_properties.py`` — because

* chunks partition time, so per-user session starts/ends stay totally
  ordered across chunks and ``lag(session_end)`` is the correct
  predecessor for the stitch's gap test;
* chunk-local sessions are gap-maximal within their chunk, so ONLY
  boundary sessions can merge, and chains through empty chunks are
  handled by the stitch being itself a gap-merge (no adjacency
  assumption — ``chunk_hours`` may be smaller than the gap);
* ``session_id`` is re-derived as the per-user time rank of the final
  sessions, which is exactly what the single window's running sum
  assigns (two sessions of one user cannot share a start: they would
  be within gap).

Timestamps must be non-null (the events table contract); ties on
``ts`` break by ``order_col`` inside a chunk and cannot straddle
chunks (same ts ⇒ same chunk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize_events(
    ev: DataFrame,
    gap_minutes: int = 30,
    chunk_hours: float | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Gap-merged sessions: ``(user_id, session_id, n_events,
    session_start, session_end)``. ``chunk_hours=None`` is the exact
    single-window form; any positive value switches to the
    chunk-and-stitch plan above with bit-identical output."""
    gap_us = gap_minutes * 60 * 1_000_000
    if chunk_hours is None:
        w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
        marked = ev.withColumn(
            "new_session",
            F.when(
                F.lag(ts_col).over(w).isNull()
                | (
                    F.unix_micros(ts_col)
                    - F.unix_micros(F.lag(ts_col).over(w))
                    > gap_us
                ),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        w2 = (
            Window.partitionBy(user_col)
            .orderBy(ts_col, order_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        numbered = marked.withColumn(
            "session_id", F.sum("new_session").over(w2)
        )
        return numbered.groupBy(user_col, "session_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )

    chunk_us = int(chunk_hours * 3600 * 1_000_000)
    if chunk_us <= 0:
        raise ValueError("chunk_hours must be positive")
    chunked = ev.withColumn(
        "__chunk", F.floor(F.unix_micros(ts_col) / chunk_us)
    )
    # 1) gap-merge INSIDE (user, chunk): the hot user's sort spreads
    #    across its chunks instead of one window partition
    wc = Window.partitionBy(user_col, "__chunk").orderBy(ts_col, order_col)
    marked = chunked.withColumn(
        "__new",
        F.when(
            F.lag(ts_col).over(wc).isNull()
            | (
                F.unix_micros(ts_col)
                - F.unix_micros(F.lag(ts_col).over(wc))
                > gap_us
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    wc2 = (
        Window.partitionBy(user_col, "__chunk")
        .orderBy(ts_col, order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = (
        marked.withColumn("__ls", F.sum("__new").over(wc2))
        .groupBy(user_col, "__chunk", "__ls")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
    )
    # 2) split boundary (first/last local session of its chunk — the
    #    only rows a cross-chunk merge can touch) from interior; the
    #    max-__ls window runs over SESSION rows co-partitioned with wc
    wmax = Window.partitionBy(user_col, "__chunk")
    local = local.withColumn("__mx", F.max("__ls").over(wmax))
    boundary = local.where((F.col("__ls") == 1) | (F.col("__ls") == F.col("__mx")))
    interior = local.where(
        (F.col("__ls") != 1) & (F.col("__ls") != F.col("__mx"))
    ).select(user_col, "n_events", "session_start", "session_end")
    # 3) stitch: the SAME gap-merge over the per-user boundary-session
    #    frame (O(2 x chunks) rows per user); ends are increasing in
    #    start order, so lag(end) is the true predecessor
    ws = Window.partitionBy(user_col).orderBy("session_start")
    stitched = boundary.withColumn(
        "__new",
        F.when(
            F.lag("session_end").over(ws).isNull()
            | (
                F.unix_micros("session_start")
                - F.unix_micros(F.lag("session_end").over(ws))
                > gap_us
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    ws2 = (
        Window.partitionBy(user_col)
        .orderBy("session_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = (
        stitched.withColumn("__grp", F.sum("__new").over(ws2))
        .groupBy(user_col, "__grp")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.min("session_start").alias("session_start"),
            F.max("session_end").alias("session_end"),
        )
        .select(user_col, "n_events", "session_start", "session_end")
    )
    # 4) renumber per user in time order — exactly the running sum the
    #    single window assigns; this window is over final SESSION rows
    sessions = interior.unionByName(merged)
    wr = Window.partitionBy(user_col).orderBy("session_start")
    return sessions.withColumn(
        "session_id", F.row_number().over(wr).cast("bigint")
    ).select(
        user_col, "session_id", "n_events", "session_start", "session_end"
    )
