"""Pre-verification of the query QUEUED for the r11 registry slot
(COVERAGE.md "cluster-balanced sampling" row): the registry held 149
of 150 oracled queries after the r10 swap and the r10 window was
exactly full, so ``x_cluster_balanced_sample`` could not register this
round without overflowing ``compute_front_order(strict=True)``.

This test runs the EXACT intended registration — query body and
oracle SQL verbatim — through the same order-insensitive digest as
``tools/parity.py``, at BOTH sf0.001 and the driver's grading scale
sf0.01, so the r11 swap is mechanical: move these two literals into
``extension_queries.py`` and delete this file's duplicates.

Conventions already driver-proven elsewhere: centroids = the first 8
embeddings (``x_ann_ivf_assign``), portable-md5 pick order
(``x_group_cap``), DuckDB ``list_dot_product`` cosine with round-6
(every embedding oracle). The Spark side's salted two-level top-k is
bit-identical to this oracle's single window by
``test_properties.test_topk_per_group_equals_window_form``.
"""

from __future__ import annotations

import math

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

#: intended oracle, verbatim for the r11 @register call
QUEUED_ORACLE = """
    with centroids as (
      select vec_id as centroid_id, cast(embedding as double[]) as c
      from embeddings where vec_id < 8
    ), scored as (
      select e.vec_id, c.centroid_id,
             round(list_dot_product(cast(e.embedding as double[]), c.c)
                   / (sqrt(list_dot_product(cast(e.embedding as double[]),
                                            cast(e.embedding as double[])))
                      * sqrt(list_dot_product(c.c, c.c))), 6) as sim
      from embeddings e cross join centroids c
    ), ranked as (
      select *, row_number() over (
        partition by vec_id order by sim desc, centroid_id) as rn
      from scored
    ), assigned as (
      select vec_id, centroid_id, sim from ranked where rn = 1
    )
    select vec_id, centroid_id, sim,
           cast(row_number() over (
             partition by centroid_id
             order by md5(cast(vec_id as varchar)), vec_id) as int
           ) as pick_order
    from assigned
    qualify pick_order <= 40
"""


def queued_query(spark, sf_dir):
    """Intended r11 query body, verbatim (cap 40 cuts every cell at
    both sfs: ~62 members/cell at sf0.001, ~625 at sf0.01)."""
    from pyspark.sql import functions as F

    from hive_scripts_spark.operators import similarity as S
    from hive_scripts_spark.plans.registry import table

    emb = table(spark, sf_dir, "embeddings")
    centroids = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("centroid"),
    )
    return S.cluster_balanced_sample(emb, centroids, cap_per_cell=40)


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    return str(v)


def _digest(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x01".join(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_queued_r11_matches_its_oracle(spark, sf_dir):
    got = queued_query(spark, sf_dir)
    spark_digest = _digest(got.columns, got.collect())

    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
            )
        rel = con.sql(QUEUED_ORACLE)
        duck_digest = _digest(rel.columns, rel.fetchall())
    finally:
        con.close()

    assert len(spark_digest) == len(duck_digest) > 0
    assert spark_digest == duck_digest
    # the cut must actually fire (cap < every cell's population)
    assert all(r["pick_order"] <= 40 for r in got.collect())
