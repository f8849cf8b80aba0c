"""Registry of named queries with DuckDB oracles.

Every operator claimed in SURVEY §2 registers here as a named query:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) an equivalent ANSI-SQL oracle string for DuckDB. The
driver compares the two at sf0.01 by row count + schema +
order-insensitive value hash, so:

* every computed column is aliased identically on both sides;
* float aggregates go through **exact decimal accumulation** then a cast
  to double (deterministic on both engines, immune to summation order);
* fingerprints use the portable md5-prefix modular sum
  (:mod:`hive_scripts_spark.functions.canonical`).

Import side effect: importing this module imports the query modules,
which populate :data:`QUERIES` / :data:`ORACLES` via :func:`register`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optional oracle SQL) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(
                f"duplicate query registration: {name!r} (a second "
                "register() would silently shadow the first in the "
                "driver's queries() dict)"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table (TESTDATA.md layout).

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark reads
    as a nanosecond long (``spark.sql.legacy.parquet.nanosAsLong``); it is
    converted to a microsecond timestamp here (integer division — no
    double round-trip, which would lose precision above 2^53 ns).
    """
    if name == "events":
        # runtime-settable SQL conf — the driver's session won't have it
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def _load_all() -> None:
    # populate the registry (import side effects)
    from hive_scripts_spark.plans import analytics_queries  # noqa: F401
    from hive_scripts_spark.plans import extension_queries  # noqa: F401
    from hive_scripts_spark.plans import reference_queries  # noqa: F401


_load_all()
