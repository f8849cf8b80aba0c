"""Queued r15 registration candidates (the ``test_queued_r14.py``
pattern): body + oracle held here as literals, parity-verified at
sf0.001 AND the driver's grading scale sf0.01, awaiting a capacity
swap (COVERAGE.md "Registry capacity" lists the r15 retirement
shortlist, machine-checked by test_rotation.test_shortlist_not_rotted).

1. ``x_validate_expectations`` — the r14 dbt-test/Deequ-style
   constraint report (`operators/quality_checks.py`): six rules over
   orders (+customer FK) spanning every rule kind, with both passing
   and firing constraints (status/range/regex fire; not-null/unique/
   referential pass — a report where no interesting branch executes
   would be a weaker row, the r10 lesson).
2. ``x_multimodal_resize_gif`` — completes the graded codec triple
   (JPEG r12, PNG r14): four constant-index GIF89a plan literals over
   a shared palette, REAL LZW decode + 2x2 resize, pure-SQL md5
   oracle (components < 128, md5-portable).
3. ``x_text_bigram_logprob`` — the r14 bigram-LM quality score
   (`textstats.bigram_logprob_score`): add-k-smoothed corpus bigram
   conditionals, position-ordered sequential fold (the unigram
   scorer's determinism contract, one LM order up).
"""

from __future__ import annotations

import math

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# ---------------------------------------------------------------------------
# candidate 1: x_validate_expectations
# ---------------------------------------------------------------------------

VEX_NAME = "x_validate_expectations"

VEX_ORACLE = """
    with rows_agg as (
      select
        cast(count(*) as bigint) as n_rows,
        cast(sum(case when o_custkey is null then 1 else 0 end)
             as bigint) as nn_bad,
        cast(count(o_orderstatus) as bigint) as st_chk,
        cast(sum(case when o_orderstatus is not null
                       and o_orderstatus not in ('O', 'F')
                      then 1 else 0 end) as bigint) as st_bad,
        cast(count(o_totalprice) as bigint) as pr_chk,
        cast(sum(case when o_totalprice is not null
                       and (o_totalprice < 0 or o_totalprice > 400000)
                      then 1 else 0 end) as bigint) as pr_bad,
        cast(count(o_orderpriority) as bigint) as re_chk,
        cast(sum(case when o_orderpriority is not null
                       and not regexp_full_match(o_orderpriority,
                                                 '[1-3]-[A-Z ]+')
                      then 1 else 0 end) as bigint) as re_bad
      from orders
    ), uniq as (
      select cast(count(*) as bigint) as n,
             cast(count(*) - count(distinct o_orderkey) as bigint) as bad
      from orders
    ), fk as (
      select cast(count(*) as bigint) as n,
             cast(sum(case when c.c_custkey is null then 1 else 0 end)
                  as bigint) as bad
      from orders o
      left join (select distinct c_custkey from customer
                 where c_custkey is not null) c
        on o.o_custkey = c.c_custkey
      where o.o_custkey is not null
    ), report as (
      select 'not_null:o_custkey' as constraint, 'not_null' as kind,
             'o_custkey' as "column", n_rows as n_checked,
             nn_bad as n_violations from rows_agg
      union all
      select 'accepted_values:o_orderstatus', 'accepted_values',
             'o_orderstatus', st_chk, st_bad from rows_agg
      union all
      select 'range:o_totalprice', 'range', 'o_totalprice',
             pr_chk, pr_bad from rows_agg
      union all
      select 'regex:o_orderpriority', 'regex', 'o_orderpriority',
             re_chk, re_bad from rows_agg
      union all
      select 'unique:o_orderkey', 'unique', 'o_orderkey', n, bad from uniq
      union all
      select 'referential:o_custkey', 'referential',
             'o_custkey->customer.c_custkey', n, bad from fk
    )
    select *, n_violations = 0 as passed from report
"""


def vex_query(spark, sf_dir):
    """The x_validate_expectations body (verbatim future
    registration): every rule kind over orders, FK against customer."""
    from hive_scripts_spark.operators.quality_checks import (
        validate_expectations,
    )
    from hive_scripts_spark.plans.registry import table

    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    return validate_expectations(
        orders,
        [
            {"kind": "not_null", "col": "o_custkey"},
            {"kind": "accepted_values", "col": "o_orderstatus",
             "values": ["O", "F"]},
            {"kind": "range", "col": "o_totalprice", "lo": 0.0,
             "hi": 400000.0},
            {"kind": "regex", "col": "o_orderpriority",
             "pattern": "[1-3]-[A-Z ]+"},
            {"kind": "unique", "cols": ["o_orderkey"]},
            {"kind": "referential", "col": "o_custkey",
             "ref": "customer", "ref_col": "c_custkey"},
        ],
        refs={"customer": customer},
    )


# ---------------------------------------------------------------------------
# candidate 2: x_multimodal_resize_gif
# ---------------------------------------------------------------------------

GIF_NAME = "x_multimodal_resize_gif"

#: four constant-index 8x8 GIF89a literals over one shared 4-entry
#: palette (components < 128, md5-portable rule) generated by the test
#: encoder — re-derived in test_queued_gif_literals so an edit to
#: either side fails loudly.
GIF_PALETTE = ((18, 35, 52), (69, 86, 103), (86, 103, 120), (103, 120, 127))
GIF_CONST_HEX = {
    0: (
        "4749463839610800080081000012233445566756677867787f2c000000000800"
        "0800000206848fa9cbed5d003b"
    ),
    1: (
        "4749463839610800080081000012233445566756677867787f2c000000000800"
        "08000002068c8fa9cbed5d003b"
    ),
    2: (
        "4749463839610800080081000012233445566756677867787f2c000000000800"
        "0800000206948fa9cbed5d003b"
    ),
    3: (
        "4749463839610800080081000012233445566756677867787f2c000000000800"
        "08000002069c8fa9cbed5d003b"
    ),
}

_GIF_MD5_ARMS = " ".join(
    f"when {k} then md5(repeat(chr({r}) || chr({g}) || chr({b_}), 4))"
    for k, (r, g, b_) in list(enumerate(GIF_PALETTE))[:3]
)
_gr3, _gg3, _gb3 = GIF_PALETTE[3]
GIF_ORACLE = f"""
    select doc_id,
           cast(2 as int) as width,
           cast(2 as int) as height,
           case cast(doc_id % 4 as int) {_GIF_MD5_ARMS}
                else md5(repeat(chr({_gr3}) || chr({_gg3}) || chr({_gb3}), 4))
           end as resized_md5
    from documents
"""


def gif_query(spark, sf_dir):
    """The x_multimodal_resize_gif body (verbatim future
    registration)."""
    from pyspark.sql import functions as F

    from hive_scripts_spark.operators import multimodal as M
    from hive_scripts_spark.plans.registry import table

    docs = table(spark, sf_dir, "documents")
    framed = docs.select(
        "doc_id",
        F.when(
            F.pmod("doc_id", F.lit(4)) == 0,
            F.lit(bytes.fromhex(GIF_CONST_HEX[0])),
        )
        .when(
            F.pmod("doc_id", F.lit(4)) == 1,
            F.lit(bytes.fromhex(GIF_CONST_HEX[1])),
        )
        .when(
            F.pmod("doc_id", F.lit(4)) == 2,
            F.lit(bytes.fromhex(GIF_CONST_HEX[2])),
        )
        .otherwise(F.lit(bytes.fromhex(GIF_CONST_HEX[3])))
        .alias("payload"),
    )
    return M.resize_images(
        framed,
        target=(2, 2),
        fake=False,
        parallelism=min(8, spark.sparkContext.defaultParallelism),
    )


# ---------------------------------------------------------------------------
# candidate 3: x_text_bigram_logprob
# ---------------------------------------------------------------------------

BLP_NAME = "x_text_bigram_logprob"

_NORM = (
    r"trim(regexp_replace(regexp_replace(text, chr(13), '', 'g'),"
    r" '\s+', ' ', 'g'))"
)

BLP_ORACLE = f"""
    with toks0 as (
      select doc_id, string_split({_NORM}, ' ') as ws
      from documents where length({_NORM}) > 0
    ), positions as (
      select doc_id, ws, unnest(range(1, len(ws) + 1)) as pos from toks0
    ), toks as (
      select doc_id, pos, ws[pos] as term from positions
    ), pairs as (
      select doc_id, pos, ws[pos] as w1, ws[pos + 1] as w2
      from positions where pos < len(ws)
    ), c2 as (
      select w1, w2, count(*) as c2 from pairs group by w1, w2
    ), c1 as (
      select w1, count(*) as c1 from pairs group by w1
    ), v as (
      select cast(count(distinct term) as double) as v from toks
    ), scored as (
      select p.doc_id, p.pos,
             log2((cast(c2.c2 as double) + 0.5)
                  / (cast(c1.c1 as double) + 0.5 * (select v from v))) as lp
      from pairs p
      join c2 on c2.w1 = p.w1 and c2.w2 = p.w2
      join c1 on c1.w1 = p.w1
    ), packed as (
      select doc_id, list(lp order by pos) as seq from scored group by doc_id
    )
    select doc_id,
           cast(len(seq) as bigint) as n_bigrams,
           round(-list_reduce(list_prepend(0.0, seq), (a, b) -> a + b)
                 / len(seq), 6) as mean_neg_logprob
    from packed
"""


def blp_query(spark, sf_dir):
    """The x_text_bigram_logprob body (verbatim future registration)."""
    from hive_scripts_spark.operators.textstats import bigram_logprob_score
    from hive_scripts_spark.plans.registry import table

    docs = table(spark, sf_dir, "documents")
    return bigram_logprob_score(docs, k=0.5)


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


def test_queued_gif_literals():
    """The GIF plan literals are exactly the test encoder's output for
    constant index-k images over GIF_PALETTE — re-derived, so an edit
    to either side fails."""
    import numpy as np

    from tests.test_multimodal import _gif

    for k, want in GIF_CONST_HEX.items():
        idx = np.full((8, 8), k, np.uint8)
        got = _gif(idx, list(GIF_PALETTE))
        assert got.hex() == want, k


def test_queued_vex_branches_fire(spark):
    """The report's interesting branches execute at the grading sf:
    three constraints fire, three pass (the r10 planted-duplication
    lesson applied to a validation report)."""
    out = vex_query(spark, "/root/testdata/sf0.01").collect()
    passed = {r["constraint"]: r["passed"] for r in out}
    assert passed == {
        "not_null:o_custkey": True,
        "accepted_values:o_orderstatus": False,
        "range:o_totalprice": False,
        "regex:o_orderpriority": False,
        "unique:o_orderkey": True,
        "referential:o_custkey": True,
    }


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
@pytest.mark.parametrize(
    "query,oracle",
    [
        (vex_query, VEX_ORACLE),
        (gif_query, GIF_ORACLE),
        (blp_query, BLP_ORACLE),
    ],
    ids=[VEX_NAME, GIF_NAME, BLP_NAME],
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
