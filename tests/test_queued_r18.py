"""Queued r18 registration candidates (the ``test_queued_r15.py``
pattern): body + oracle held here as literals, parity-verified at
sf0.001 AND the driver's grading scale sf0.01, awaiting a future
capacity swap. These grade the round-14 quantile face of the
mergeable-sketch family (``operators/sketches.py``):

1. ``x_digit_hist`` — the decimal-digit histogram over
   ``orders.o_totalprice`` (digits=2): every bucket is exact
   integer/decimal/string arithmetic (NO ``log()`` — cross-engine
   libm log is not correctly rounded, so a log-bucketed DDSketch
   could flip bucket indexes between engines; the digit-string form
   cannot). The oracle restates the same regexp/rpad/substr pipeline
   over the same decimal(38,6) cast.
2. ``x_digit_quantiles`` — p25/p50/p75/p95/p99 bucket selection from
   that histogram: cumulative counts over the value-ordered buckets,
   first bucket reaching ``ceil(q·n)``. The graded columns are the
   exact (q, sign, decade, sub) picks; the float midpoint estimate is
   a convenience column dropped here (its values are pytest-pinned in
   ``test_sketches.py``). Merge exactness (counter sum ≡ whole-input
   build) is pytest-pinned too.
3. ``x_digit_quantiles_grouped`` — per-``o_orderpriority`` p50/p95
   through ``digit_hist_grouped`` (the per-language length-monitor
   shape): the cumulative windows partition by group; same exact
   integer grading.
"""

from __future__ import annotations

import math

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

#: DuckDB twin of sketches._digit_parts at digits=2, scale=6: the
#: stripped significant-digit string of |v| * 10^6
_BUCKETS = """
    with vals as (
      select cast(o_totalprice as decimal(38,6)) as vd
      from orders
      where o_totalprice is not null
        and isfinite(o_totalprice) and abs(o_totalprice) < 1e31
    ), parts as (
      select vd,
             regexp_replace(
               regexp_replace(cast(abs(vd) as varchar), '[.]', ''),
               '^0+', '') as stripped
      from vals
    ), b as (
      select cast(case when vd < 0 then -1 when vd > 0 then 1
                       else 0 end as int) as sign,
             cast(length(stripped) as int) as decade,
             cast(case when length(stripped) = 0 then 0
                  else cast(rpad(substr(stripped, 1, 2), 2, '0') as int)
                  end as int) as sub
      from parts
    )
"""

# ---------------------------------------------------------------------------
# candidate 1: x_digit_hist
# ---------------------------------------------------------------------------

HIST_NAME = "x_digit_hist"

HIST_ORACLE = (
    _BUCKETS
    + """
    select sign, decade, sub, cast(count(*) as bigint) as cnt
    from b group by 1, 2, 3
"""
)


def hist_query(spark, sf_dir):
    """The x_digit_hist body (verbatim future registration)."""
    from hive_scripts_spark.operators.sketches import digit_hist
    from hive_scripts_spark.plans.registry import table

    orders = table(spark, sf_dir, "orders")
    return digit_hist(orders, "o_totalprice", digits=2)


# ---------------------------------------------------------------------------
# candidate 2: x_digit_quantiles
# ---------------------------------------------------------------------------

QUANTILES_NAME = "x_digit_quantiles"

QUANTILES_ORACLE = (
    _BUCKETS
    + """
    , h as (
      select sign, decade, sub, cast(count(*) as bigint) as cnt
      from b group by 1, 2, 3
    ), r as (
      select sign, decade, sub, cnt,
             sign * (decade * 1000 + sub) as ord
      from h
    ), c as (
      select *,
             sum(cnt) over (order by ord
               rows between unbounded preceding and current row) as cum,
             sum(cnt) over () as total
      from r
    ), q as (
      select unnest(cast([0.25, 0.5, 0.75, 0.95, 0.99] as double[])) as q
    ), e as (
      select q.q, c.sign, c.decade, c.sub, c.ord
      from q, c where c.cum >= ceil(q.q * c.total)
    )
    select q, sign, decade, sub from e
    qualify row_number() over (partition by q order by ord) = 1
"""
)


def quantiles_query(spark, sf_dir):
    """The x_digit_quantiles body (verbatim future registration):
    exact bucket picks only — the float midpoint stays un-graded."""
    from hive_scripts_spark.operators.sketches import (
        digit_hist,
        digit_hist_quantiles,
    )
    from hive_scripts_spark.plans.registry import table

    orders = table(spark, sf_dir, "orders")
    sk = digit_hist(orders, "o_totalprice", digits=2)
    return digit_hist_quantiles(
        sk, [0.25, 0.5, 0.75, 0.95, 0.99], digits=2
    ).select("q", "sign", "decade", "sub")


# ---------------------------------------------------------------------------
# candidate 3: x_digit_quantiles_grouped (per-group percentiles)
# ---------------------------------------------------------------------------

GROUPED_NAME = "x_digit_quantiles_grouped"

_GROUPED_BUCKETS = """
    with vals as (
      select o_orderpriority,
             cast(o_totalprice as decimal(38,6)) as vd
      from orders
      where o_totalprice is not null
        and isfinite(o_totalprice) and abs(o_totalprice) < 1e31
    ), parts as (
      select o_orderpriority, vd,
             regexp_replace(
               regexp_replace(cast(abs(vd) as varchar), '[.]', ''),
               '^0+', '') as stripped
      from vals
    ), b as (
      select o_orderpriority,
             cast(case when vd < 0 then -1 when vd > 0 then 1
                       else 0 end as int) as sign,
             cast(length(stripped) as int) as decade,
             cast(case when length(stripped) = 0 then 0
                  else cast(rpad(substr(stripped, 1, 2), 2, '0') as int)
                  end as int) as sub
      from parts
    )
"""

GROUPED_ORACLE = (
    _GROUPED_BUCKETS
    + """
    , h as (
      select o_orderpriority, sign, decade, sub,
             cast(count(*) as bigint) as cnt
      from b group by 1, 2, 3, 4
    ), r as (
      select *, sign * (decade * 1000 + sub) as ord from h
    ), c as (
      select *,
             sum(cnt) over (partition by o_orderpriority order by ord
               rows between unbounded preceding and current row) as cum,
             sum(cnt) over (partition by o_orderpriority) as total
      from r
    ), q as (
      select unnest(cast([0.5, 0.95] as double[])) as q
    ), e as (
      select q.q, c.o_orderpriority, c.sign, c.decade, c.sub, c.ord
      from q, c where c.cum >= ceil(q.q * c.total)
    )
    select o_orderpriority, q, sign, decade, sub from e
    qualify row_number() over (partition by o_orderpriority, q
                               order by ord) = 1
"""
)


def grouped_query(spark, sf_dir):
    """The x_digit_quantiles_grouped body (verbatim future
    registration): per-priority p50/p95 picks — per-group percentiles
    the way a per-language length monitor runs them."""
    from hive_scripts_spark.operators.sketches import (
        digit_hist_grouped,
        digit_hist_quantiles_grouped,
    )
    from hive_scripts_spark.plans.registry import table

    orders = table(spark, sf_dir, "orders")
    sk = digit_hist_grouped(
        orders, ["o_orderpriority"], "o_totalprice", digits=2
    )
    return digit_hist_quantiles_grouped(
        sk, ["o_orderpriority"], [0.5, 0.95], digits=2
    ).select("o_orderpriority", "q", "sign", "decade", "sub")


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
        (hist_query, HIST_ORACLE),
        (quantiles_query, QUANTILES_ORACLE),
        (grouped_query, GROUPED_ORACLE),
    ],
    ids=[HIST_NAME, QUANTILES_NAME, GROUPED_NAME],
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
