"""Queued r17 registration candidates (the ``test_queued_r15.py``
pattern): body + oracle held here as literals, parity-verified at
sf0.001 AND the driver's grading scale sf0.01, awaiting a future
capacity swap. These grade the round-14 mergeable-sketch family
(``operators/sketches.py`` — incremental distinct / frequency
statistics, the persist-at-write-time pattern for 100 TB lakes):

1. ``x_kmv_distinct`` — KMV k-minimum-values distinct sketch +
   estimate over ``orders.o_custkey`` (k=256). sf0.001 has 150
   distinct custkeys (< k → the exact under-full branch); sf0.01 has
   1500 (> k → the ``(k-1)*2^60/h_k`` estimator branch) — one query
   grades BOTH estimator arms across the two parity scales. The
   oracle restates the k-smallest-distinct-md5 construction in pure
   SQL.
2. ``x_kmv_grouped`` — per-``o_orderpriority`` KMV sketches (k=64)
   through the two-level no-raw-shuffle plan, estimated per group;
   oracle = row_number over distinct hashes.
3. ``x_countmin_heavy`` — count-min (depth 4 × width 256) over
   ``lineitem.l_suppkey``, probed for every supplier key; the oracle
   rebuilds the salted counter grid and the min-over-rows lookup in
   SQL. One-sided-error and merge exactness are pytest-pinned in
   ``test_sketches.py``.

Float parity note: the KMV estimator constant ``(k-1) * 2^60`` is
exact in IEEE double on both engines (8 significant bits × a power of
two), the division is a single correctly-rounded op, and both sides
round to 4 decimals — same discipline as the graded jaccard rows.

Null parity note: the sketch pre-image is ``sketch_pre_image`` — a
per-column md5 block with a ``'<null>'`` sentinel — restated verbatim
in the oracles below. A raw ``cast(x as varchar)`` twin would DIVERGE
on nullable columns (Spark's concat_ws never returns null; SQL md5
propagates NULL); the block form is null-identical on both engines,
pinned by ``test_sketches.py::test_kmv_null_parity_with_duckdb``.
"""

from __future__ import annotations

import math

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

#: DuckDB twin of dedup.portable_hash60 (single pre-image slot)
_H60 = "cast(('0x' || substr(md5({pre}), 1, 15)) as bigint)"

#: DuckDB twin of sketches._col_block (null-safe fixed-width block)
_BLOCK = (
    "case when {c} is null then '<null>' "
    "else md5(cast({c} as varchar)) end"
)

# ---------------------------------------------------------------------------
# candidate 1: x_kmv_distinct
# ---------------------------------------------------------------------------

KMV_NAME = "x_kmv_distinct"

KMV_ORACLE = f"""
    with h as (
      select distinct
             {_H60.format(pre=_BLOCK.format(c="o_custkey"))} as kmv_hash
      from orders
    ), topk as (
      select kmv_hash from h order by kmv_hash limit 256
    )
    select cast(count(*) as bigint) as n_hashes,
           max(kmv_hash) as kth_hash,
           round(case when count(*) < 256 then cast(count(*) as double)
                 else (cast(255 as double)
                       * cast(1152921504606846976 as double))
                      / cast(max(kmv_hash) as double) end, 4) as est_distinct
    from topk
"""


def kmv_query(spark, sf_dir):
    """The x_kmv_distinct body (verbatim future registration)."""
    from hive_scripts_spark.operators.sketches import kmv_estimate, kmv_sketch
    from hive_scripts_spark.plans.registry import table

    orders = table(spark, sf_dir, "orders")
    return kmv_estimate(kmv_sketch(orders, ["o_custkey"], k=256), k=256)


# ---------------------------------------------------------------------------
# candidate 2: x_kmv_grouped
# ---------------------------------------------------------------------------

KMV_GROUPED_NAME = "x_kmv_grouped"

KMV_GROUPED_ORACLE = f"""
    with h as (
      select distinct o_orderpriority,
             {_H60.format(pre=_BLOCK.format(c="o_custkey"))} as kmv_hash
      from orders
    ), ranked as (
      select o_orderpriority, kmv_hash,
             row_number() over (partition by o_orderpriority
                                order by kmv_hash) as rn
      from h
    ), topk as (
      select o_orderpriority, kmv_hash from ranked where rn <= 64
    )
    select o_orderpriority,
           cast(count(*) as bigint) as n_hashes,
           round(case when count(*) < 64 then cast(count(*) as double)
                 else (cast(63 as double)
                       * cast(1152921504606846976 as double))
                      / cast(max(kmv_hash) as double) end, 4) as est_distinct
    from topk
    group by o_orderpriority
"""


def kmv_grouped_query(spark, sf_dir):
    """The x_kmv_grouped body (verbatim future registration): the
    two-level grouped sketch (raw rows never shuffle) + per-group
    estimates."""
    from hive_scripts_spark.operators.sketches import (
        kmv_estimate_grouped,
        kmv_sketch_grouped,
    )
    from hive_scripts_spark.plans.registry import table

    orders = table(spark, sf_dir, "orders")
    sk = kmv_sketch_grouped(
        orders, ["o_orderpriority"], ["o_custkey"], k=64
    )
    return kmv_estimate_grouped(sk, ["o_orderpriority"], k=64)


# ---------------------------------------------------------------------------
# candidate 3: x_countmin_heavy
# ---------------------------------------------------------------------------

COUNTMIN_NAME = "x_countmin_heavy"

_CM_HASH = _H60.format(
    pre="cast(cm_row as varchar) || ':' || " + _BLOCK.format(c="{key}")
)

COUNTMIN_ORACLE = f"""
    with rows_d as (select unnest([0, 1, 2, 3]) as cm_row),
    sketch as (
      select cm_row,
             cast({_CM_HASH.format(key="l_suppkey")} % 256 as int)
               as cm_bucket,
             cast(count(*) as bigint) as cm_count
      from lineitem, rows_d
      group by 1, 2
    ),
    probes as (
      select s_suppkey, cm_row,
             cast({_CM_HASH.format(key="s_suppkey")} % 256 as int)
               as cm_bucket
      from supplier, rows_d
    )
    select p.s_suppkey,
           min(coalesce(sk.cm_count, 0)) as est_count
    from probes p
    left join sketch sk using (cm_row, cm_bucket)
    group by p.s_suppkey
"""


def countmin_query(spark, sf_dir):
    """The x_countmin_heavy body (verbatim future registration):
    build the counter grid over lineitem, broadcast it, probe every
    supplier key."""
    from pyspark.sql import functions as F

    from hive_scripts_spark.operators.sketches import (
        countmin_build,
        countmin_lookup,
    )
    from hive_scripts_spark.plans.registry import table

    li = table(spark, sf_dir, "lineitem")
    keys = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    sk = countmin_build(li, "l_suppkey", depth=4, width=256)
    out = countmin_lookup(sk, keys, "l_suppkey", depth=4, width=256)
    return out.select(
        F.col("l_suppkey").alias("s_suppkey"), "est_count"
    )


# ---------------------------------------------------------------------------
# parity harness (same order-insensitive digest as tools/parity.py)
# ---------------------------------------------------------------------------


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
@pytest.mark.parametrize(
    "query,oracle",
    [
        (kmv_query, KMV_ORACLE),
        (kmv_grouped_query, KMV_GROUPED_ORACLE),
        (countmin_query, COUNTMIN_ORACLE),
    ],
    ids=[KMV_NAME, KMV_GROUPED_NAME, COUNTMIN_NAME],
)
def test_queued_query_matches_oracle(spark, sf_dir, query, oracle):
    got = query(spark, sf_dir)
    spark_digest = _digest(got.columns, got.collect())
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
            )
        rel = con.sql(oracle)
        duck_digest = _digest(rel.columns, rel.fetchall())
    finally:
        con.close()
    assert len(spark_digest) == len(duck_digest) > 0
    assert spark_digest == duck_digest
