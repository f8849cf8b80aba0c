"""Extended analytics surface: multi-dimensional aggregation (rollup /
cube / grouping sets / pivot), statistics (percentiles), semi-structured
extraction (JSON), temporal joins (as-of, range), and global top-k.

The reference delegates all SQL to Hive (SURVEY §0); these queries
demonstrate the full Spark SQL surface the engine exposes in its place,
each with a DuckDB oracle. Prefix ``g_``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_scripts_spark.operators.asof import asof_join
from hive_scripts_spark.plans.registry import register, table

# ---------------------------------------------------------------------------
# multi-dimensional aggregation
# ---------------------------------------------------------------------------


@register(
    "g_rollup_pricing",
    oracle="""
    select l_returnflag, l_linestatus,
           count(*) as n_items,
           cast(sum(cast(l_quantity as decimal(18,2))) as double) as sum_qty
    from lineitem
    group by rollup(l_returnflag, l_linestatus)
    """,
)
def g_rollup_pricing(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
    )


@register(
    "g_cube_order_status",
    oracle="""
    select o_orderstatus, o_orderpriority, count(*) as n_orders
    from orders
    group by cube(o_orderstatus, o_orderpriority)
    """,
)
def g_cube_order_status(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@register(
    "g_grouping_sets",
    oracle="""
    select l_returnflag, l_linestatus, count(*) as n_items
    from lineitem
    group by grouping sets ((l_returnflag), (l_linestatus))
    """,
)
def g_grouping_sets(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__gs_lineitem")
    return spark.sql(
        """
        select l_returnflag, l_linestatus, count(*) as n_items
        from __gs_lineitem
        group by grouping sets ((l_returnflag), (l_linestatus))
        """
    )


@register(
    "g_pivot_status_by_priority",
    oracle="""
    select o_orderpriority,
           count(*) filter (where o_orderstatus = 'F') as n_f,
           count(*) filter (where o_orderstatus = 'O') as n_o,
           count(*) filter (where o_orderstatus = 'P') as n_p
    from orders group by o_orderpriority
    """,
)
def g_pivot_status_by_priority(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .toDF("o_orderpriority", "n_f", "n_o", "n_p")
        # pivot leaves NULL for empty cells; the filtered-count oracle says 0
        .fillna(0, subset=["n_f", "n_o", "n_p"])
    )


# ---------------------------------------------------------------------------
# statistics
# ---------------------------------------------------------------------------


@register(
    "g_percentiles",
    oracle="""
    select o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 4) as p50,
           round(quantile_cont(o_totalprice, 0.9), 4) as p90,
           round(min(o_totalprice), 4) as min_price,
           round(max(o_totalprice), 4) as max_price
    from orders group by o_orderstatus
    """,
)
def g_percentiles(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.min("o_totalprice"), 4).alias("min_price"),
        F.round(F.max("o_totalprice"), 4).alias("max_price"),
    )


@register("g_approx_distinct")  # HLL sketch — engine-specific, rows-only
def g_approx_distinct(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
    )


# ---------------------------------------------------------------------------
# semi-structured extraction (events.props is a JSON string)
# ---------------------------------------------------------------------------


@register(
    "g_json_extract",
    oracle="""
    select event_id, json_extract_string(props, '$.k') as k_value
    from events
    """,
)
def g_json_extract(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.get_json_object("props", "$.k").alias("k_value")
    )


@register(
    "g_json_agg",
    oracle="""
    select event_type,
           cast(sum(cast(json_extract_string(props, '$.k') as bigint)) as bigint)
             as k_total
    from events group by event_type
    """,
)
def g_json_agg(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("k_total")
    )


# ---------------------------------------------------------------------------
# temporal joins
# ---------------------------------------------------------------------------


@register(
    "g_asof_last_error",
    oracle="""
    select c.event_id, c.ts, c.user_id,
           e.ts as matched_ts, e.event_id as r_event_id
    from (select * from events where event_type = 'click') c
    asof left join (select event_id, ts, user_id from events
                    where event_type = 'error') e
      on c.user_id = e.user_id and c.ts >= e.ts
    """,
)
def g_asof_last_error(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "ts", "user_id"
    )
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "ts", "user_id"
    )
    return asof_join(clicks, errors, key="user_id", ts="ts", right_cols=["event_id"])


@register(
    "g_range_join",
    oracle="""
    select l.event_id as l_id, r.event_id as r_id,
           epoch_us(l.ts) - epoch_us(r.ts) as delta_us
    from (select * from events where event_type = 'purchase') l
    join (select * from events where event_type = 'click') r
      on l.user_id = r.user_id
     and epoch_us(l.ts) - epoch_us(r.ts) between 0 and 3600000000
    """,
)
def g_range_join(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase")
    clicks = ev.where(F.col("event_type") == "click")
    # per-user range join: bucket by user too — compose the bucketed range
    # join with the key equi-join by prefixing the bucket with the user
    l = purchases.select(
        F.col("event_id").alias("l_id"),
        "user_id",
        F.unix_micros("ts").alias("l_us"),
    )
    r = clicks.select(
        F.col("event_id").alias("r_id"),
        "user_id",
        F.unix_micros("ts").alias("r_us"),
    )
    w = 3_600_000_000
    lb = F.floor(F.col("l_us") / w).cast("long")
    l_exp = l.select(
        "l_id", "user_id", "l_us", F.explode(F.array(lb, lb - 1)).alias("bucket")
    )
    r_b = r.withColumn("bucket", F.floor(F.col("r_us") / w).cast("long"))
    return (
        l_exp.join(r_b, ["user_id", "bucket"])
        .where((F.col("l_us") - F.col("r_us")).between(0, w))
        .select("l_id", "r_id", (F.col("l_us") - F.col("r_us")).alias("delta_us"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# ordering / top-k
# ---------------------------------------------------------------------------


@register(
    "g_global_topk",
    oracle="""
    select o_orderkey, o_totalprice from orders
    order by o_totalprice desc, o_orderkey limit 25
    """,
)
def g_global_topk(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "g_q3_shipping_priority",
    oracle="""
    select l.l_orderkey,
           cast(sum(cast(l.l_extendedprice * (1 - l.l_discount)
                         as decimal(28,6))) as double) as revenue,
           o.o_orderdate
    from customer c
    join orders o on c.c_custkey = o.o_custkey
    join lineitem l on l.l_orderkey = o.o_orderkey
    where c.c_mktsegment = 'BUILDING'
      and o.o_orderdate < timestamp '1998-03-15'
      and l.l_shipdate  > timestamp '1998-03-15'
    group by l.l_orderkey, o.o_orderdate
    order by revenue desc, l.l_orderkey limit 10
    """,
)
def g_q3_shipping_priority(spark, sf_dir):
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-03-15").cast("timestamp")
    return (
        li.where(F.col("l_shipdate") > cutoff)
        .join(
            orders.where(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cust.where(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(28,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@register(
    "g_q4_order_priority",
    oracle="""
    select o_orderpriority, count(*) as order_count
    from orders o
    where o.o_orderdate >= timestamp '1997-01-01'
      and o.o_orderdate <  timestamp '1997-04-01'
      and exists (select 1 from lineitem l
                  where l.l_orderkey = o.o_orderkey
                    and l.l_shipdate > o.o_orderdate)
    group by o_orderpriority
    """,
)
def g_q4_order_priority(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    window_orders = orders.where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    # EXISTS with a correlated inequality → semi-join on key + predicate
    late = window_orders.join(
        li,
        (window_orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > window_orders.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "g_q14_promo_share",
    oracle="""
    select round(
             100.0 * cast(sum(case when p.p_type = 'PROMO'
                 then cast(l.l_extendedprice * (1 - l.l_discount) as decimal(28,6))
                 else cast(0 as decimal(28,6)) end) as double)
             / cast(sum(cast(l.l_extendedprice * (1 - l.l_discount)
                             as decimal(28,6))) as double), 6) as promo_share_pct
    from lineitem l join part p on l.l_partkey = p.p_partkey
    where l.l_shipdate >= timestamp '1997-06-01'
      and l.l_shipdate <  timestamp '1997-07-01'
    """,
)
def g_q14_promo_share(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(28,6)"
    )
    zero = F.lit(0).cast("decimal(28,6)")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast(
                    "double"
                )
                / F.sum(rev).cast("double"),
                6,
            ).alias("promo_share_pct")
        )
    )


@register(
    "g_having_big_customers",
    oracle="""
    select o_custkey, count(*) as n_orders,
           cast(sum(cast(o_totalprice as decimal(18,2))) as double) as total_spend
    from orders
    group by o_custkey
    having count(*) >= 15
    """,
)
def g_having_big_customers(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spend"),
        )
        .where(F.col("n_orders") >= 15)
    )


@register(
    "g_scalar_subquery_above_avg",
    oracle="""
    select count(*) as n_above_avg from orders
    where o_totalprice > (select avg(o_totalprice) from orders)
    """,
)
def g_scalar_subquery_above_avg(spark, sf_dir):
    orders = table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("__sq_orders")
    return spark.sql(
        """
        select count(*) as n_above_avg from __sq_orders
        where o_totalprice > (select avg(o_totalprice) from __sq_orders)
        """
    )


# ---------------------------------------------------------------------------
# string-function batch (upper/lower/lpad/like/locate — SURVEY §2.5 family)
# ---------------------------------------------------------------------------


@register(
    "g_string_functions",
    oracle="""
    select p_partkey,
           upper(p_brand) as brand_upper,
           lower(p_type) as type_lower,
           lpad(cast(p_size as varchar), 4, '0') as size_padded,
           (p_name like '%red%') as is_red,
           strpos(p_name, 'widget') as widget_pos
    from part
    """,
)
def g_string_functions(spark, sf_dir):
    part = table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.col("p_name").like("%red%").alias("is_red"),
        F.locate("widget", F.col("p_name")).alias("widget_pos"),
    )


# ---------------------------------------------------------------------------
# TPC-H-derived batch 2 (q6/q10/q17/q18 adapted to the testdata schema —
# no shipmode/commitdate columns, so filters use the columns that exist)
# ---------------------------------------------------------------------------


@register(
    "g_q6_forecast_revenue",
    oracle="""
    select cast(sum(cast(l_extendedprice * l_discount as decimal(28,6))) as double)
             as revenue,
           count(*) as n_lines
    from lineitem
    where l_shipdate >= timestamp '1997-01-01 00:00:00'
      and l_shipdate <  timestamp '1998-01-01 00:00:00'
      and l_discount between 0.03 and 0.07
      and l_quantity < 24
    """,
)
def g_q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: single-scan filter + global agg. All four predicates push
    down to the parquet scan; the agg is a map-side partial + 1-row merge,
    so at 100 TB this is scan-bound with no shuffle of row data."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(28,6)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "g_q10_returned_items",
    oracle="""
    select c.c_custkey, c.c_name, n.n_name as nation,
           cast(sum(cast(l.l_extendedprice * (1 - l.l_discount) as decimal(28,6)))
                as double) as revenue
    from customer c
    join orders o on c.c_custkey = o.o_custkey
    join lineitem l on o.o_orderkey = l.l_orderkey
    join nation n on c.c_nationkey = n.n_nationkey
    where o.o_orderdate >= timestamp '1997-01-01 00:00:00'
      and o.o_orderdate <  timestamp '1997-04-01 00:00:00'
      and l.l_returnflag = 'R'
    group by c.c_custkey, c.c_name, n.n_name
    order by revenue desc, c.c_custkey
    limit 20
    """,
)
def g_q10_returned_items(spark, sf_dir):
    """TPC-H Q10: returned-item revenue per customer, top 20.

    Scale shape: the orders date filter pushes to the scan, the
    customer/nation dims broadcast, and the final top-20 is a
    TakeOrderedAndProject (per-partition heap + driver merge of 20-row
    heads — no global sort). Tiebreak on c_custkey keeps the row SET
    deterministic for the oracle compare.
    """
    li = table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,6)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "g_q17_small_quantity_revenue",
    oracle="""
    with pa as (
      select l_partkey,
             sum(cast(l_quantity as decimal(18,2))) as qsum,
             count(*) as qcnt
      from lineitem group by l_partkey
    )
    select cast(cast(sum(cast(l.l_extendedprice as decimal(28,6))) as double) / 7.0
                as double) as avg_yearly,
           count(*) as n_lines
    from lineitem l
    join part p on p.p_partkey = l.l_partkey
    join pa on pa.l_partkey = l.l_partkey
    where p.p_brand = 'Brand#4'
      and cast(l.l_quantity as decimal(18,2)) * 5 * pa.qcnt < pa.qsum
    """,
)
def g_q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17: lines below 20% of the part's average quantity.

    The correlated aggregate subquery is decorrelated explicitly: one
    groupBy(l_partkey) per-part aggregate, re-joined on the key — the
    same plan Catalyst produces for the correlated SQL, expressed
    declaratively. The threshold compare is kept in exact decimals
    (l_quantity*5*cnt < sum) so the boundary set is engine-independent —
    a double `avg()` differs in the last ulp between engines.
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#4")
    pa = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qsum"),
        F.count(F.lit(1)).alias("qcnt"),
    )
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(pa.withColumnRenamed("l_partkey", "pa_key"), F.col("l_partkey") == F.col("pa_key"))
        .where(
            F.col("l_quantity").cast("decimal(18,2)") * 5 * F.col("qcnt")
            < F.col("qsum")
        )
    )
    return joined.agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(28,6)")).cast("double") / 7.0
        ).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "g_q18_large_volume_customer",
    oracle="""
    select c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           cast(o.o_totalprice as double) as totalprice,
           cast(sum(cast(l.l_quantity as decimal(18,2))) as double) as sum_qty
    from customer c
    join orders o on c.c_custkey = o.o_custkey
    join lineitem l on o.o_orderkey = l.l_orderkey
    where o.o_orderkey in (
      select l_orderkey from lineitem
      group by l_orderkey
      having sum(cast(l_quantity as decimal(18,2))) > 300
    )
    group by c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def g_q18_large_volume_customer(spark, sf_dir):
    """TPC-H Q18: orders whose total quantity exceeds 300.

    The IN-subquery is a semi-join against a pre-aggregated key set; the
    HAVING filter shrinks it to a handful of keys, so it broadcasts and
    the big tables never shuffle for the membership test. The outer
    re-aggregation groups by orderkey — same key as the semi-join, so AQE
    coalesces rather than re-shuffles.
    """
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    dq = F.col("l_quantity").cast("decimal(18,2)")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dq).alias("__qty"))
        .where(F.col("__qty") > 300)
        .select("l_orderkey")
    )
    return (
        li.join(F.broadcast(big.withColumnRenamed("l_orderkey", "__big_key")),
                F.col("l_orderkey") == F.col("__big_key"), "inner")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(dq).cast("double").alias("sum_qty"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            F.col("o_totalprice").cast("double").alias("totalprice"), "sum_qty",
        )
    )


@register(
    "g_q19_disjunctive_revenue",
    oracle="""
    select cast(sum(cast(l.l_extendedprice * (1 - l.l_discount) as decimal(28,6)))
                as double) as revenue,
           count(*) as n_lines
    from lineitem l
    join part p on p.p_partkey = l.l_partkey
    where (p.p_brand = 'Brand#1' and p.p_size between 1 and 15
           and l.l_quantity between 1 and 11)
       or (p.p_brand = 'Brand#2' and p.p_size between 1 and 25
           and l.l_quantity between 10 and 20)
       or (p.p_brand = 'Brand#3' and p.p_size between 1 and 35
           and l.l_quantity between 20 and 30)
    """,
)
def g_q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19: disjunction of (brand, size, quantity) triads.

    The OR spans both join sides, so the exact filter evaluates
    post-join — but Catalyst pushes each side's OR *envelope* to its scan
    (the quantity-range disjunction to lineitem, the brand/size
    disjunction to part: both appear in PushedFilters). The part side
    broadcasts, so lineitem never shuffles.
    """
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    triad = lambda b, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == b)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return j.where(
        triad("Brand#1", 15, 1, 11)
        | triad("Brand#2", 25, 10, 20)
        | triad("Brand#3", 35, 20, 30)
    ).agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,6)"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "g_q15_top_supplier",
    oracle="""
    with rev as (
      select l_suppkey,
             sum(cast(l_extendedprice * (1 - l_discount) as decimal(28,6)))
               as total_rev
      from lineitem
      where l_shipdate >= timestamp '1997-01-01 00:00:00'
        and l_shipdate <  timestamp '1997-04-01 00:00:00'
      group by l_suppkey
    )
    select s.s_suppkey, s.s_name, cast(r.total_rev as double) as total_revenue
    from supplier s
    join rev r on s.s_suppkey = r.l_suppkey
    where r.total_rev = (select max(total_rev) from rev)
    """,
)
def g_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue.

    The revenue CTE aggregates once; the scalar max is a 1-row broadcast
    equi-joined back on the (exact decimal) revenue value — ties all
    surface, like the SQL. The comparison stays in decimal: a double max
    could diverge between engines in the last ulp.
    """
    li = table(spark, sf_dir, "lineitem")
    sup = table(spark, sf_dir, "supplier")
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(28,6)"
                )
            ).alias("total_rev")
        )
    )
    top = rev.agg(F.max("total_rev").alias("__max_rev"))
    return (
        rev.join(F.broadcast(top), rev.total_rev == F.col("__max_rev"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
        )
    )
