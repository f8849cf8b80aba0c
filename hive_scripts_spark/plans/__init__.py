"""Query-plan registry: the driver-facing surface of the engine."""

from hive_scripts_spark.plans.registry import QUERIES, ORACLES, register

__all__ = ["QUERIES", "ORACLES", "register"]
