"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship UC#1 count-reconciliation query on
sf0.001; ``queries()`` / ``oracle_sql()`` expose every implemented
operator from SURVEY §2 (+ §2.9 extensions) for the sf0.01 DuckDB
correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    UC#1 cross-database row-count reconciliation (SURVEY §3.1): per-
    partition counts of a source table vs a deterministically-perturbed
    target, full-outer joined into a matched/mismatched status frame.
    """
    from hive_scripts_spark.plans.registry import QUERIES

    return QUERIES["j2_count_reconcile"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from hive_scripts_spark.plans.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted for the genuinely
    non-SQL-expressible ops: LSH/SimHash blocking, xxhash64 paths)."""
    from hive_scripts_spark.plans.registry import ORACLES

    return dict(ORACLES)
