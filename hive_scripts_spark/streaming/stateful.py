"""Custom stateful streaming operators via ``applyInPandasWithState``.

API choice note (r7): Spark 4's successor API
(``transformWithStateInPandas`` — named ValueState/ListState/MapState on
the RocksDB store, timers, TTL) was evaluated and works API-wise, but
its state-server protocol needs the ``google.protobuf`` Python package,
which this runtime does not ship (the TWS driver worker crashes with
``ImportError: cannot import name 'descriptor' from 'google.protobuf'``
during query planning). ``applyInPandasWithState`` has no such
dependency, so it stays the supported stateful surface here; the TWS
port is mechanical when the dependency is available (same per-key
update closure, state tuple moves into ``handle.getValueState``).

State-store note (r8): the **RocksDB state store provider** was
evaluated against these operators and WORKS on this runtime (unlike
TWS): two-micro-batch ``running_user_totals`` under
``RocksDBStateStoreProvider`` + changelog checkpointing carries state
across batches with exact parity to the batch twin and reports the
full rocksdb metric set in query progress (pytest-pinned in
``tests/test_stateful_streaming.py``). It is OPT-IN via
:func:`enable_rocksdb_state` rather than a blanket default because the
default HDFS-backed store is faster for the tiny key spaces of local
tests; at 100 TB — state ∝ live keys, far beyond executor heap — the
RocksDB provider is the correct choice: state lives on executor-local
disk (heap holds only block cache), snapshots upload incrementally,
and changelog checkpointing turns per-batch checkpoint cost from
O(state) into O(delta).

These are the operators Structured Streaming's built-ins don't express:
arbitrary per-key state evolved across micro-batches, with Arrow-batched
Python logic. State is partitioned by key across executors and bounded by
timeouts — the 100 TB posture is the same as any keyed shuffle, plus
store size ∝ live keys.

Provided:

* :func:`running_user_totals` — per-user running event count / value sum
  (the micro-batch twin of a `groupBy(user).agg(...)` that never ends).
* :func:`streaming_dedup` — cross-batch exact dedup on an id column with
  TTL state, for at-least-once sources (the streaming face of
  ``operators.dedup.exact_dedup``).
* :func:`replay_dedup_batch` / the ``groupBy(user).agg`` face of
  :func:`running_user_totals` — BATCH twins with identical semantics,
  registered as oracled driver queries (`x_events_replay_dedup`,
  `x_events_user_totals`); exact batch↔stream parity is asserted in
  ``tests/test_stateful_streaming.py``.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

#: session confs for the RocksDB state store (see module docstring's
#: r8 evaluation note). Provider class is read per-query at start, so
#: these are runtime-settable — no rebuilt SparkSession needed.
ROCKSDB_STATE_CONFS = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
    # per-batch checkpoint uploads the CHANGELOG instead of a full
    # snapshot: O(delta) not O(state) — the conf that makes large
    # stateful streams checkpoint-bound instead of state-size-bound
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": (
        "true"
    ),
}


def enable_rocksdb_state(spark) -> None:
    """Switch subsequently-started streaming queries on this session to
    the RocksDB state store (executor-local-disk state + changelog
    checkpointing). Opt-in: correct choice when live-key state outgrows
    executor heap; the default HDFS-backed store is faster for small
    state. Apply to an isolated ``spark.newSession()`` to scope the
    switch."""
    for k, v in ROCKSDB_STATE_CONFS.items():
        spark.conf.set(k, v)


RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
_RUNNING_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals across all micro-batches (update mode).

    State: one (count, sum) pair per user — O(users), partitioned by the
    grouping key. No timeout: totals live for the stream's lifetime; add
    ``GroupStateTimeout.ProcessingTimeTimeout`` + ``state.setTimeoutDuration``
    for TTL eviction when the key space is unbounded.

    The update function is a closure (not module-level) on purpose:
    cloudpickle ships closures by value, so Python workers don't need
    this package importable — module-level functions pickle by reference
    and break when the driver runs outside the repo.
    """

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DEDUP_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)
_SEEN_STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Replay dedup via the BUILT-IN ``dropDuplicatesWithinWatermark``:
    the first record per key wins and duplicates arriving within the
    watermark horizon are dropped JVM-side — no Python state worker at
    all, so this is the preferred form whenever "first occurrence within
    the replay horizon" is the contract. State per key is evicted once
    the watermark passes it, which bounds memory on unbounded streams;
    :func:`streaming_dedup` (applyInPandasWithState) remains for exact
    unbounded-horizon dedup where eviction is not acceptable.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys) if keys else ["event_id"]
    )


def streaming_dedup(events: DataFrame) -> DataFrame:
    """Exact cross-batch dedup on ``event_id``: the first occurrence wins,
    replays are dropped. State is one boolean per seen id — pair with a
    timeout matching the source's replay horizon to bound it.
    (Closure for the same pickling reason as :func:`running_user_totals`.)
    """

    def emit_first_only(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        first_batch = None
        for pdf in batches:
            if first_batch is None and len(pdf):
                first_batch = pdf
        if state.exists or first_batch is None:
            return  # already emitted in an earlier batch (or empty group)
        state.update((True,))
        row = first_batch.sort_values("ts").iloc[:1]
        yield row[["event_id", "user_id", "event_type", "value"]]

    return events.groupBy("event_id").applyInPandasWithState(
        emit_first_only,
        outputStructType=DEDUP_SCHEMA,
        stateStructType=_SEEN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def replay_dedup_batch(
    events: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """Batch twin of :func:`streaming_dedup` / ``dedup_within_watermark``:
    first occurrence per key wins, by event time. Deterministic where
    ``dropDuplicates`` is not — the survivor is picked by a map-side-
    partial ``min`` of a ``(ts, payload)`` struct (ties break on the
    payload columns in order), ONE exchange keyed on the dedup key, no
    window sort. Same contract the stateful operator enforces across
    micro-batches; parity is asserted in tests.
    """
    from pyspark.sql import functions as F

    keys = list(keys) if keys else ["event_id"]
    payload = [c for c in events.columns if c not in keys]
    # event time leads the ordering struct regardless of column order
    ordered = sorted(payload, key=lambda c: c != "ts")
    packed = events.groupBy(*keys).agg(
        F.min(F.struct(*ordered)).alias("__first")
    )
    return packed.select(*keys, *[F.col(f"__first.{c}") for c in payload])
