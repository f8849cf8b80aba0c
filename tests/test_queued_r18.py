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
3. ``x_robots_decisions`` — the RFC 9309 decision fold over six URL
   arms and a two-payload fixture rules table, promoted from the r19
   queue slot per the r16 VERDICT item 5 (three digit rows would have
   graded one sketch family while the crawl surface waited; the
   displaced ``x_digit_quantiles_grouped`` row now waits in
   ``test_queued_r19.py``, its parity test intact). The LIKE patterns
   are plan literals, so the oracle replays the longest-match /
   allow-wins-tie fold in pure SQL over the same rules.
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
# candidate 3: x_robots_decisions (the RFC 9309 decision fold, value-graded;
# promoted from the r19 queue slot per the r16 VERDICT item 5)
# ---------------------------------------------------------------------------

ROBOTS_NAME = "x_robots_decisions"

#: promoted over the former x_countmin_merged queued row (r15 VERDICT
#: item 4: three queued rows graded the one sketch-MERGE algebraic
#: property — x_kmv_merge_groups keeps that grade; the count-min merge
#: stays pytest-pinned in test_sketches.py). The robots LIKE patterns
#: are plan literals, so the oracle REPLAYS the longest-match /
#: allow-wins-tie fold over the same fixture rules table in pure SQL —
#: '/private/' compiles to '/private/%' spec 9, '/private/ok/' to
#: '/private/ok/%' spec 12, and the $-anchored '/*.php$' to '/%.php'
#: spec 7 (no trailing %), exactly build_rules_fn's compilation.
ROBOTS_ORACLE = """
    with armed as (
      select doc_id, cast(doc_id % 6 as int) as arm,
             cast(doc_id as varchar) as i
      from documents
    ), docs as (
      select doc_id,
             case arm
               when 0 then 'https://quota.example/public/p' || i
               when 1 then 'https://quota.example/private/p' || i
               when 2 then 'https://quota.example/private/ok/p' || i
               when 3 then 'https://files.example/tmp/p' || i || '.php'
               when 4 then 'https://files.example/tmp/p' || i || '.php?x=1'
               else 'doc ' || i || ' plain'
             end as url,
             case when arm <= 2 then 'quota.example'
                  when arm <= 4 then 'files.example'
                  else '' end as host,
             case arm
               when 0 then '/public/p' || i
               when 1 then '/private/p' || i
               when 2 then '/private/ok/p' || i
               when 3 then '/tmp/p' || i || '.php'
               when 4 then '/tmp/p' || i || '.php?x=1'
               else '/' end as path
      from armed
    ), rules(host, pat, spec, allow) as (
      values ('quota.example', '/private/%', 9, false),
             ('quota.example', '/private/ok/%', 12, true),
             ('files.example', '/%.php', 7, false)
    ), matched as (
      select d.doc_id, r.allow,
             row_number() over (
               partition by d.doc_id
               order by r.spec desc, r.allow desc) as rn
      from docs d
      join rules r on r.host = d.host and d.path like r.pat
    )
    select d.doc_id, d.url, coalesce(m.allow, true) as robots_allowed
    from docs d
    left join (select doc_id, allow from matched where rn = 1) m
      using (doc_id)
"""


def robots_query(spark, sf_dir):
    """The x_robots_decisions body (verbatim future registration): six
    URL arms per doc across two hosts + a non-URL, decided by
    apply_robots against a two-payload fixture rules table compiled
    through the REAL robots_rules mapInPandas path for a NAMED agent
    (exact-token group selection). Arms exercise: no-match allow,
    prefix disallow, longer-Allow override, $-anchored wildcard
    disallow, anchor miss via query string, and the no-host
    passthrough."""
    from pyspark.sql import functions as F

    from hive_scripts_spark.operators.robots import (
        apply_robots,
        robots_rules,
    )
    from hive_scripts_spark.plans.registry import table

    docs = table(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    arm = F.pmod("doc_id", F.lit(6))
    url = (
        F.when(arm == 0, F.concat(
            F.lit("https://quota.example/public/p"), i))
        .when(arm == 1, F.concat(
            F.lit("https://quota.example/private/p"), i))
        .when(arm == 2, F.concat(
            F.lit("https://quota.example/private/ok/p"), i))
        .when(arm == 3, F.concat(
            F.lit("https://files.example/tmp/p"), i, F.lit(".php")))
        .when(arm == 4, F.concat(
            F.lit("https://files.example/tmp/p"), i, F.lit(".php?x=1")))
        .otherwise(F.concat(F.lit("doc "), i, F.lit(" plain")))
    )
    framed = docs.select("doc_id", url.alias("url"))
    rules = robots_rules(
        spark.createDataFrame(
            [
                (
                    "quota.example",
                    "User-agent: trainbot\nDisallow: /private/\n"
                    "Allow: /private/ok/\n",
                ),
                ("files.example", "User-agent: *\nDisallow: /*.php$\n"),
            ],
            "host string, payload string",
        ),
        agent="trainbot",
    )
    return apply_robots(framed, rules, url_col="url")


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
        (robots_query, ROBOTS_ORACLE),
    ],
    ids=[HIST_NAME, QUANTILES_NAME, ROBOTS_NAME],
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
