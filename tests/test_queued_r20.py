"""Queued r20 registration candidates (the ``test_queued_r15.py``
pattern): body + oracle held as literals, parity-verified at sf0.001
AND the driver's grading scale sf0.01, awaiting a future capacity
swap. Grades the round-14 eval-contamination composition, ONE
sketch-algebra row (``x_kmv_merge_groups`` — the r15 VERDICT judged
three merge rows redundant for one algebraic property, so the
count-min and digit merge paths stay pytest-pinned and their queued
slots were promoted to the r15 crawl-library surface), and the
per-domain quota:

``x_split_leakage`` — near-duplicate pairs that STRADDLE the
train/val/test boundary (``operators/curation.split_leakage_pairs``):
the leakage that silently turns a held-out set into a memorization
test. Composes two already-portable pieces end to end — the md5
MinHash-LSH verified pair pipeline (the ``x_dedup_minhash_portable``
oracle CTEs, imported so the two queries can never drift apart) and
the hash-stable split assignment (the ``x_train_val_split`` idiom).
Split shares are 50/25/25 here (not the production 90/5/5) so the
boundary-crossing probability is ~62 % and the graded result is
robustly non-empty at both scales.
"""

from __future__ import annotations

import math

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

LEAKAGE_NAME = "x_split_leakage"


def _leakage_oracle() -> str:
    from hive_scripts_spark.plans.extension_queries import (
        _DUCK_MINHASH_VERIFIED,
    )

    return (
        _DUCK_MINHASH_VERIFIED
        + """
    , assigned as (
      select doc_id,
             case when b < 50 then 'train'
                  when b < 75 then 'val'
                  else 'test' end as split
      from (
        select doc_id,
               cast(('0x' || substr(
                   md5('split' || chr(1) || cast(doc_id as varchar)),
                   1, 15)) as bigint) % 100 as b
        from documents
      )
    )
    select v.a_id, v.b_id, v.jaccard,
           sa.split as split_a, sb.split as split_b
    from mh_verified v
    join assigned sa on v.a_id = sa.doc_id
    join assigned sb on v.b_id = sb.doc_id
    where sa.split != sb.split
"""
    )


LEAKAGE_ORACLE = _leakage_oracle()


def leakage_query(spark, sf_dir):
    """The x_split_leakage body (verbatim future registration)."""
    from hive_scripts_spark.operators.curation import split_leakage_pairs
    from hive_scripts_spark.operators.dedup import (
        minhash_lsh_pairs_portable,
    )
    from hive_scripts_spark.plans.registry import table

    docs = table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs_portable(docs, threshold=0.2)
    leaks = split_leakage_pairs(
        docs, pairs, key_cols=["doc_id"], val_pct=25, test_pct=25
    )
    return leaks.select("a_id", "b_id", "jaccard", "split_a", "split_b")


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


# ---------------------------------------------------------------------------
# candidate 2: x_kmv_merge_groups (sketch algebra as a graded row)
# ---------------------------------------------------------------------------

KMV_MERGE_NAME = "x_kmv_merge_groups"

#: the merged estimate equals the whole-table estimate by the KMV
#: exactness theorem; the oracle deliberately restates the TWO-LEVEL
#: construction (per-group survivors → global k smallest) instead of
#: relying on the theorem, so the merge path itself is what is graded
KMV_MERGE_ORACLE = """
    with h as (
      select distinct o_orderpriority,
             cast(('0x' || substr(md5(
               case when o_custkey is null then '<null>'
                    else md5(cast(o_custkey as varchar)) end
             ), 1, 15)) as bigint) as kmv_hash
      from orders
    ), ranked as (
      select o_orderpriority, kmv_hash,
             row_number() over (partition by o_orderpriority
                                order by kmv_hash) as rn
      from h
    ), survivors as (
      select kmv_hash from ranked where rn <= 128
    ), topk as (
      select distinct kmv_hash from survivors
      order by kmv_hash limit 128
    )
    select cast(count(*) as bigint) as n_hashes,
           max(kmv_hash) as kth_hash,
           round(case when count(*) < 128 then cast(count(*) as double)
                 else (cast(127 as double)
                       * cast(1152921504606846976 as double))
                      / cast(max(kmv_hash) as double) end, 4) as est_distinct
    from topk
"""


def kmv_merge_query(spark, sf_dir):
    """The x_kmv_merge_groups body (verbatim future registration):
    per-priority sketches merged into one global estimate — the
    persist-per-partition / answer-any-range pattern as a graded
    row."""
    from hive_scripts_spark.operators.sketches import (
        kmv_estimate,
        kmv_merge,
        kmv_sketch_grouped,
    )
    from hive_scripts_spark.plans.registry import table

    orders = table(spark, sf_dir, "orders")
    grouped = kmv_sketch_grouped(
        orders, ["o_orderpriority"], ["o_custkey"], k=128
    )
    merged = kmv_merge([grouped.select("kmv_hash")], k=128)
    return kmv_estimate(merged, k=128)


# ---------------------------------------------------------------------------
# candidate 3: x_domain_cap (the per-registrable-domain quota, value-graded)
# ---------------------------------------------------------------------------

DOMAIN_CAP_NAME = "x_domain_cap"

#: promoted over the former x_digit_hist_merged queued row (r15 VERDICT
#: item 4: three queued rows graded the one sketch-MERGE algebraic
#: property — x_kmv_merge_groups above keeps that grade; the digit
#: merge stays pytest-pinned in test_sketches.py). The salted
#: two-level top-k is bit-transparent, so the oracle is the plain
#: single-window row_number over (md5(id), id) — the documented oracle
#: idiom for everything built on topk_per_group — partitioned by the
#: eTLD+1 the arms construct: www.big.example collapses to big.example,
#: a./b.shared.example SHARE one quota, tiny.example (4 docs) passes
#: through under-cap, and no-host URLs cap inside the '' bucket.
DOMAIN_CAP_ORACLE = """
    with armed as (
      select doc_id, cast(doc_id % 10 as int) as arm,
             cast(doc_id as varchar) as i
      from documents
    ), docs as (
      select doc_id,
             case
               when arm = 9 and doc_id < 40
                 then 'https://tiny.example/p' || i
               when arm = 9 then 'doc ' || i || ' plain'
               when arm = 7 then 'https://a.shared.example/p' || i
               when arm = 8 then 'https://b.shared.example/p' || i
               else 'https://www.big.example/p' || i
             end as url,
             case
               when arm = 9 and doc_id < 40 then 'tiny.example'
               when arm = 9 then ''
               when arm in (7, 8) then 'shared.example'
               else 'big.example'
             end as domain
      from armed
    ), ranked as (
      select doc_id, url,
             cast(row_number() over (
               partition by domain
               order by md5(cast(doc_id as varchar)), doc_id) as int)
               as pick_order
      from docs
    )
    select doc_id, url, pick_order from ranked where pick_order <= 25
"""


def domain_cap_query(spark, sf_dir):
    """The x_domain_cap body (verbatim future registration): a skewed
    four-domain URL mix (70 % one domain — the hot group the salted
    top-k exists for) through the full cap_per_domain path, cap 25,
    keep_rank for the graded pick_order audit column."""
    from pyspark.sql import functions as F

    from hive_scripts_spark.operators.curation import cap_per_domain
    from hive_scripts_spark.plans.registry import table

    docs = table(spark, sf_dir, "documents")
    i = F.col("doc_id").cast("string")
    arm = F.pmod("doc_id", F.lit(10))
    url = (
        F.when(
            (arm == 9) & (F.col("doc_id") < 40),
            F.concat(F.lit("https://tiny.example/p"), i),
        )
        .when(arm == 9, F.concat(F.lit("doc "), i, F.lit(" plain")))
        .when(arm == 7, F.concat(F.lit("https://a.shared.example/p"), i))
        .when(arm == 8, F.concat(F.lit("https://b.shared.example/p"), i))
        .otherwise(F.concat(F.lit("https://www.big.example/p"), i))
    )
    framed = docs.select("doc_id", url.alias("url"))
    return cap_per_domain(framed, cap=25, salts=8, keep_rank=True)


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
@pytest.mark.parametrize(
    "query,oracle",
    [
        (leakage_query, LEAKAGE_ORACLE),
        (kmv_merge_query, KMV_MERGE_ORACLE),
        (domain_cap_query, DOMAIN_CAP_ORACLE),
    ],
    ids=[LEAKAGE_NAME, KMV_MERGE_NAME, DOMAIN_CAP_NAME],
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
