"""Queued r20 registration candidates (the ``test_queued_r15.py``
pattern): body + oracle held as literals, parity-verified at sf0.001
AND the driver's grading scale sf0.01, awaiting a future capacity
swap. Grades the round-14 eval-contamination composition plus two
sketch-algebra rows (``x_kmv_merge_groups``, ``x_digit_hist_merged``
— with r19's ``x_countmin_merged``, every sketch family's MERGE path
is value-graded):

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
# candidate 3: x_digit_hist_merged (the digit merge path, value-graded —
# completes the merge-path grading triple: kmv / countmin / digit)
# ---------------------------------------------------------------------------

DIGIT_MERGE_NAME = "x_digit_hist_merged"

DIGIT_MERGE_ORACLE = """
    with halves as (
      select cast(o_orderkey % 2 as int) as half,
             cast(o_totalprice as decimal(38,6)) as vd
      from orders
      where o_totalprice is not null
        and isfinite(o_totalprice) and abs(o_totalprice) < 1e31
    ), parts as (
      select half, vd,
             regexp_replace(
               regexp_replace(cast(abs(vd) as varchar), '[.]', ''),
               '^0+', '') as stripped
      from halves
    ), grids as (
      select half,
             cast(case when vd < 0 then -1 when vd > 0 then 1
                       else 0 end as int) as sign,
             cast(length(stripped) as int) as decade,
             cast(case when length(stripped) = 0 then 0
                  else cast(rpad(substr(stripped, 1, 2), 2, '0') as int)
                  end as int) as sub,
             cast(count(*) as bigint) as cnt
      from parts
      group by 1, 2, 3, 4
    )
    select sign, decade, sub, cast(sum(cnt) as bigint) as cnt
    from grids group by 1, 2, 3
"""


def digit_merge_query(spark, sf_dir):
    """The x_digit_hist_merged body (verbatim future registration):
    per-half histograms merged counter-wise — the oracle restates the
    split+sum construction, grading the merge path itself."""
    from pyspark.sql import functions as F

    from hive_scripts_spark.operators.sketches import (
        digit_hist,
        digit_hist_merge,
    )
    from hive_scripts_spark.plans.registry import table

    orders = table(spark, sf_dir, "orders")
    halves = [
        digit_hist(
            orders.where(F.col("o_orderkey") % 2 == h),
            "o_totalprice",
            digits=2,
        )
        for h in (0, 1)
    ]
    return digit_hist_merge(halves)



@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
@pytest.mark.parametrize(
    "query,oracle",
    [
        (leakage_query, LEAKAGE_ORACLE),
        (kmv_merge_query, KMV_MERGE_ORACLE),
        (digit_merge_query, DIGIT_MERGE_ORACLE),
    ],
    ids=[LEAKAGE_NAME, KMV_MERGE_NAME, DIGIT_MERGE_NAME],
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
