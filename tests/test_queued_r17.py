"""Registration parity checks for the three r17 capacity-swap queries.

The queries were pre-verified (r16) with their bodies and oracle SQL
held as literals in this file; the r17 swap moved all three verbatim
into ``plans/extension_queries.py``, retiring ``g_cube_order_status``,
``g_rollup_pricing``, and ``x_events_sessionize_chunked`` (the strict-
rotation-safe retirees — every one drawn from the r17 stale set, the
50 r14-green queries, per the r16 VERDICT's simulation; COVERAGE.md
"Registry capacity"). These tests now pull the REGISTERED query +
oracle from the registry and re-run the same order-insensitive digest
comparison as ``tools/parity.py`` at BOTH sf0.001 and the driver's
grading scale sf0.01, so any later edit to either side re-proves
parity instead of trusting the r16 snapshot.

Float parity note: the KMV estimator constant ``(k-1) * 2^60`` is
exact in IEEE double on both engines (8 significant bits × a power of
two), the division is a single correctly-rounded op, and both sides
round to 4 decimals — same discipline as the graded jaccard rows.

Null parity note: the sketch pre-image is ``sketch_pre_image`` — a
per-column md5 block with a ``'<null>'`` sentinel — restated verbatim
in the registered oracles. A raw ``cast(x as varchar)`` twin would
DIVERGE on nullable columns (Spark's concat_ws never returns null;
SQL md5 propagates NULL); the block form is null-identical on both
engines, pinned by ``test_sketches.py::test_kmv_null_parity_with_duckdb``.
"""

from __future__ import annotations

import math

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

NAMES = (
    "x_kmv_distinct",
    "x_kmv_grouped",
    "x_countmin_heavy",
)


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    return str(v)


def _digest(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x01".join(_norm(r[i]) for i in order) for r in rows)


def test_kmv_grades_both_estimator_arms(spark):
    """The registration's whole point: sf0.001 has 150 distinct
    custkeys (< k=256 → the exact under-full branch returns the count
    itself) while the driver's grading scale sf0.01 has 1500 (> k →
    the (k-1)*2^60/h_k estimator branch fires). One query, both arms,
    across the two parity scales — assert the branch split is real so
    a testdata regeneration that collapses it fails loudly."""
    from hive_scripts_spark.plans.registry import QUERIES

    under = QUERIES["x_kmv_distinct"](spark, "/root/testdata/sf0.001").head()
    over = QUERIES["x_kmv_distinct"](spark, "/root/testdata/sf0.01").head()
    assert under["n_hashes"] < 256  # under-full: exact branch
    assert under["est_distinct"] == float(under["n_hashes"])
    assert over["n_hashes"] == 256  # saturated: estimator branch
    assert over["est_distinct"] != float(over["n_hashes"])


def test_countmin_one_sided_at_grading_sf(spark):
    """Count-min's defining guarantee on the graded shape: every
    supplier estimate ≥ its true lineitem frequency (width 256 over
    ~100 keys at sf0.01 means collisions are plausible but
    underestimates are impossible)."""
    from pyspark.sql import functions as F

    from hive_scripts_spark.plans.registry import QUERIES, table

    sf_dir = "/root/testdata/sf0.01"
    est = QUERIES["x_countmin_heavy"](spark, sf_dir)
    true = (
        table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_suppkey").alias("s_suppkey"))
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    joined = est.join(true, "s_suppkey", "left").select(
        "est_count", F.coalesce("true_count", F.lit(0)).alias("true_count")
    )
    assert joined.where(F.col("est_count") < F.col("true_count")).count() == 0


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
@pytest.mark.parametrize("name", NAMES)
def test_registered_r17_query_matches_its_oracle(spark, sf_dir, name):
    from hive_scripts_spark.plans.registry import ORACLES, QUERIES

    assert name in QUERIES and name in ORACLES

    got = QUERIES[name](spark, sf_dir)
    spark_digest = _digest(got.columns, got.collect())

    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
            )
        rel = con.sql(ORACLES[name])
        duck_digest = _digest(rel.columns, rel.fetchall())
    finally:
        con.close()

    assert len(spark_digest) == len(duck_digest) > 0
    assert spark_digest == duck_digest
