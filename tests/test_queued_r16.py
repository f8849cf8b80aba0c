"""Queued r16 registration candidates (the ``test_queued_r15.py``
pattern): body + oracle held here as literals, parity-verified at
sf0.001 AND the driver's grading scale sf0.01, awaiting a future
capacity swap. These grade the round-14 crawl-pipeline additions:

1. ``x_url_canonical`` — ``functions/urls.py`` over four noise-variant
   URL shapes built per doc (case, default port, tracking params,
   userinfo, trailing slashes, two-level public suffix, non-URL
   passthrough); the oracle restates each arm's normal form in pure
   SQL (the plan-literal grading philosophy of the codec rows).
2. ``x_merge_upsert`` — the recrawl merge over orders: a derived delta
   re-prices every 7th order (every 3rd of those a tombstone); the
   oracle restates latest-wins + tombstone semantics as set algebra.
   One change row per key, so the non-portable xxhash64 tiebreak never
   fires (its determinism is pytest-pinned instead).
3. ``x_scd2_apply`` — SCD2 over customer (dim) + orders (change
   stream, ``o_orderkey`` as the unique-per-key version clock): the
   oracle replays close-at-first-change + lead-chaining in SQL.
"""

from __future__ import annotations

import math

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

ORDER_COLS = (
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
    "o_orderdate", "o_orderpriority",
)

# ---------------------------------------------------------------------------
# candidate 1: x_url_canonical
# ---------------------------------------------------------------------------

URL_NAME = "x_url_canonical"

URL_ORACLE = """
    with armed as (
      select doc_id, cast(doc_id % 4 as int) as arm,
             cast(doc_id as varchar) as i
      from documents
    )
    select doc_id,
           case arm
             when 0 then 'http://example.org/doc/' || i || '?a=1&b=2'
             when 1 then 'https://sub.example.co.uk/p' || i || '?y=8&z=9'
             when 2 then 'https://x.io:8443/a/' || i || '/b'
             else 'doc ' || i || ' plain'
           end as url_canonical,
           case arm
             when 0 then 'example.org'
             when 1 then 'sub.example.co.uk'
             when 2 then 'x.io'
             else ''
           end as host,
           case arm
             when 0 then 'example.org'
             when 1 then 'example.co.uk'
             when 2 then 'x.io'
             else ''
           end as domain
    from armed
"""


def url_query(spark, sf_dir):
    """The x_url_canonical body (verbatim future registration): four
    noise-variant URL shapes per doc through the full function
    surface."""
    from pyspark.sql import functions as F

    from hive_scripts_spark.functions.urls import (
        canonical_url,
        url_host,
        url_registered_domain,
    )
    from hive_scripts_spark.plans.registry import table

    docs = table(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    arm = F.pmod("doc_id", F.lit(4))
    url = (
        F.when(arm == 0, F.concat(
            F.lit("HTTP://Example.ORG:80/doc/"), i,
            F.lit("/?utm_source=x&b=2&a=1#frag"),
        ))
        .when(arm == 1, F.concat(
            F.lit("https://Sub.Example.CO.UK/p"), i, F.lit("?z=9&y=8"),
        ))
        .when(arm == 2, F.concat(
            F.lit("https://user:pw@X.io:8443/a/"), i, F.lit("/b/"),
        ))
        .otherwise(F.concat(F.lit("doc "), i, F.lit(" plain")))
    )
    framed = docs.select("doc_id", url.alias("url"))
    return framed.select(
        "doc_id",
        canonical_url("url").alias("url_canonical"),
        url_host("url").alias("host"),
        url_registered_domain("url").alias("domain"),
    )


# ---------------------------------------------------------------------------
# candidate 2: x_merge_upsert
# ---------------------------------------------------------------------------

MERGE_NAME = "x_merge_upsert"

MERGE_ORACLE = """
    select o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority
    from orders where o_orderkey % 7 <> 0
    union all
    select o_orderkey, o_custkey, o_orderstatus,
           o_totalprice * 2 as o_totalprice, o_orderdate,
           o_orderpriority
    from orders
    where o_orderkey % 7 = 0 and o_orderkey % 3 <> 0
"""


def merge_query(spark, sf_dir):
    """The x_merge_upsert body (verbatim future registration): the
    recrawl merge — every 7th order re-priced by a delta, every 3rd of
    those tombstoned; latest-wins keyed on o_orderkey."""
    from pyspark.sql import functions as F

    from hive_scripts_spark.operators.incremental import merge_upsert
    from hive_scripts_spark.plans.registry import table

    # pin the projection to ORDER_COLS: the oracle enumerates exactly
    # these six, so a testdata regeneration that widens the orders
    # schema must not silently change the merge's output surface
    orders = table(spark, sf_dir, "orders").select(*ORDER_COLS)
    changes = orders.where(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
        (F.col("o_orderkey") % 3 == 0).alias("deleted"),
    )
    return merge_upsert(
        orders,
        changes,
        ["o_orderkey"],
        order_col="o_totalprice",
        delete_col="deleted",
    )


# ---------------------------------------------------------------------------
# candidate 3: x_scd2_apply
# ---------------------------------------------------------------------------

SCD2_NAME = "x_scd2_apply"

SCD2_ORACLE = """
    with chg as (
      select o_custkey as c_custkey,
             o_orderpriority as c_mktsegment,
             cast(o_orderkey as bigint) as valid_from,
             lead(cast(o_orderkey as bigint)) over (
               partition by o_custkey order by o_orderkey) as valid_to
      from orders
    ), firstc as (
      select o_custkey as c_custkey,
             cast(min(o_orderkey) as bigint) as fc
      from orders group by o_custkey
    )
    select c.c_custkey, c.c_mktsegment,
           cast(0 as bigint) as valid_from, f.fc as valid_to
    from customer c join firstc f using (c_custkey)
    union all
    select c.c_custkey, c.c_mktsegment,
           cast(0 as bigint) as valid_from, cast(null as bigint) as valid_to
    from customer c
    where c_custkey not in (select o_custkey from orders)
    union all
    select c_custkey, c_mktsegment, valid_from, valid_to from chg
"""


def scd2_query(spark, sf_dir):
    """The x_scd2_apply body (verbatim future registration): customer
    segments as the dimension, orders as the change stream with the
    unique-per-key o_orderkey as the version clock."""
    from pyspark.sql import functions as F

    from hive_scripts_spark.operators.incremental import scd2_apply
    from hive_scripts_spark.plans.registry import table

    dim = table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.lit(0).cast("bigint").alias("valid_from"),
        F.lit(None).cast("bigint").alias("valid_to"),
    )
    changes = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderpriority").alias("c_mktsegment"),
        F.col("o_orderkey").cast("bigint").alias("effective_ts"),
    )
    return scd2_apply(dim, changes, ["c_custkey"])


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
        (url_query, URL_ORACLE),
        (merge_query, MERGE_ORACLE),
        (scd2_query, SCD2_ORACLE),
    ],
    ids=[URL_NAME, MERGE_NAME, SCD2_NAME],
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
