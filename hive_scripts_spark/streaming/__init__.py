"""Structured Streaming surface (SURVEY §2.7 / §7.9 — stretch scope).

The reference has no streaming; this module provides the micro-batch twin
of the reconciliation pipeline plus windowed event analytics, so the
engine covers late-arriving data at 100 TB ingest rates.
"""

from hive_scripts_spark.streaming.windowed import (
    hourly_event_counts,
    read_event_stream,
    streaming_partition_counts,
)

__all__ = [
    "hourly_event_counts",
    "read_event_stream",
    "streaming_partition_counts",
]
