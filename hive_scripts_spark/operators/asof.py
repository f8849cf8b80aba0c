"""As-of and range joins over event-time (engine completeness ops).

The reference has no temporal joins; these are standard large-scale
event-pipeline operators the engine provides Spark-first:

* **as-of join** — for each left row, the latest right row with
  ``right.ts <= left.ts`` per key. Implemented as the union+window
  pattern (tag both sides, one sort-window per key over the merged
  stream) — a single shuffle on the key, no per-row probing, no UDF;
  this is the scalable formulation (a broadcast-range probe would cap
  the right side, and a naive range join explodes).
* **range join** — pairs within a time window, as an equi-join on a
  coarse time bucket (plus the neighbor bucket) with an exact filter —
  bounding the join fan-out to bucket-local candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row (same ``key``,
    ``right.ts <= left.ts``; right wins ties).

    Union+window: right rows sort before left rows at equal ts, a
    ``last_value(ignorenulls)`` running window carries the right
    payload forward, then left rows are filtered back out. One shuffle
    (by ``key``), one sort — the plan any dedicated as-of operator would
    produce.

    Ties are fully pinned: among right rows sharing (key, ts), the
    greatest ``(ts, *right_cols)`` payload struct wins (the sort adds
    the payload as a final ordering key, so the carried match is not
    sort-placement luck). Without this, equal-ts right rows make the
    result nondeterministic run-to-run AND unmatchable against any
    oracle.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (key, ts)]
    payload = F.struct(F.col(ts).alias("__rts"), *[F.col(c) for c in right_cols])
    payload_type = right.select(payload.alias("p")).schema[0].dataType
    left_types = {f.name: f.dataType for f in left.schema.fields}
    extra = [c for c in left.columns if c not in (key, ts)]

    l_tag = left.select(
        F.col(key),
        F.col(ts),
        *extra,
        F.lit(1).alias("__side"),
        F.lit(None).cast(payload_type).alias("__payload"),
    )
    r_tag = right.select(
        F.col(key),
        F.col(ts),
        *[F.lit(None).cast(left_types[c]).alias(c) for c in extra],
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
    )

    merged = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(key)
        .orderBy(
            F.col(ts).asc(),
            F.col("__side").asc(),
            # pin equal-ts right rows: greatest payload struct wins the
            # last_value carry (left rows are all-NULL here and already
            # separated by __side)
            F.col("__payload").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    ).where(F.col("__side") == 1)

    if tolerance_us is not None:
        in_tol = (
            F.unix_micros(F.col(ts)) - F.unix_micros(F.col("__match.__rts"))
        ) <= tolerance_us
        carried = carried.withColumn(
            "__match", F.when(in_tol, F.col("__match")).otherwise(F.lit(None))
        )

    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.col("__match.__rts").alias("matched_ts"))
    out_cols += [F.col(f"__match.{c}").alias(f"r_{c}") for c in right_cols]
    return carried.select(*out_cols)


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    ts: str = "ts",
    window_us: int = 60_000_000,
    left_id: str = "event_id",
    right_id: str = "event_id",
) -> DataFrame:
    """Pairs (l, r) with ``0 <= l.ts - r.ts <= window_us``.

    Bucketed equi-join: both sides key on ``floor(ts / window)``; each
    left row probes its own and the previous bucket, then an exact range
    filter trims. Join fan-out is bounded by per-bucket density instead
    of the full O(n²) time cross product.
    """
    lb = F.floor(F.unix_micros(F.col(ts)) / window_us)
    l = left.select(
        F.col(left_id).alias("l_id"),
        F.unix_micros(F.col(ts)).alias("l_us"),
        F.explode(F.array(lb.cast("long"), lb.cast("long") - 1)).alias("bucket"),
    )
    r = right.select(
        F.col(right_id).alias("r_id"),
        F.unix_micros(F.col(ts)).alias("r_us"),
        F.floor(F.unix_micros(F.col(ts)) / window_us).cast("long").alias("bucket"),
    )
    return (
        l.join(r, "bucket")
        .where(
            (F.col("l_us") - F.col("r_us") >= 0)
            & (F.col("l_us") - F.col("r_us") <= window_us)
        )
        .select("l_id", "r_id", (F.col("l_us") - F.col("r_us")).alias("delta_us"))
        .distinct()
    )
