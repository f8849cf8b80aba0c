"""Queued registration candidate (the ``test_queued_r15.py`` pattern):
body + oracle held as literals, parity-verified at sf0.001 AND the
driver's grading scale sf0.01, awaiting a future capacity swap. This is
COVERAGE.md "Post-queue roadmap" item 2, pulled forward to r18: the
planted-pair closed-form construction that re-grades the embedding
near-dup family through the PRODUCTION hyperplane-LSH path, so the
registry can retire ``x_embed_near_dup`` (exhaustive-by-contract — the
one declared scale-weak row since r9, VERDICT r17 "What's wrong" item
1) without losing a value-graded row for the operator.

``x_embed_near_dup_planted`` — derive a planted corpus IN-PLAN from
``embeddings``: per base row, THREE copies via ``posexplode`` — copies
0 and 1 the vector verbatim (ids ``3·vec_id`` and ``3·vec_id + 1``,
the identical twin whose cosine is exactly 1.0), copy 2 with dimension
0 sign-flipped (id ``3·vec_id + 2``). Base rows are kept only when
dimension 0 carries strictly more than 2% of the squared norm, which
bounds every flip-pair cosine at ``1 − 2·(v0²/|v|²) < 0.96``. Run the
real production path (``embedding_near_dup_pairs(use_lsh=True)``,
banded random-hyperplane blocking + exact-cosine verify) at threshold
0.99. Determinism argument, by construction:

* every pair ABOVE threshold is an identical-copy pair (cosine 1.0) —
  identical vectors produce identical signatures in every LSH table,
  so they are GUARANTEED candidates regardless of the hyperplane
  draw, and exact verify emits them;
* both planted flip pairs per base (verbatim-vs-flip, twice) sit
  below 0.96 < 0.99, so exact verify kills them WHATEVER the banding
  did (the false-positive arm — flipping one dimension leaves most
  band signatures intact, so these pairs really do reach the verify
  join; measured at sf0.001: 114 of them pass a loose 0.5 threshold);
* cross-base pairs are near-random testdata cosines (max ≪ 0.9 at the
  grading scales — pinned below with margin), so they can never reach
  the threshold whether or not a bucket pairs them.

The output is therefore EXACTLY the kept-base twin pairs with cosine
1.0, and the oracle restates construction + threshold arithmetic in
closed form (no O(n²) oracle join — the thing this row exists to
retire). Recall through real banding, precision through real verify:
the full production machinery is value-graded, and would run unchanged
on a 100 TB corpus (LSH-bounded candidates, O(n·tables) blocking rows).
"""

from __future__ import annotations

import math

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

PLANTED_NAME = "x_embed_near_dup_planted"

#: strictly-greater energy cut: dimension 0 must carry > 2% of the
#: squared norm, so flip cosine < 0.96 with a 0.03 margin to threshold
_ENERGY_CUT = 0.02
_THRESHOLD = 0.99

PLANTED_ORACLE = f"""
    with staged as (
      select vec_id, cast(embedding as double[]) as vec
      from embeddings
    ), m as (
      select vec_id,
             list_dot_product(vec, vec) as n2,
             vec[1] as v0
      from staged
    )
    select vec_id * 3 as a_id, vec_id * 3 + 1 as b_id,
           cast(1.0 as double) as cosine_sim
    from m
    where n2 > 0 and v0 * v0 > {_ENERGY_CUT} * n2
"""


def planted_query(spark, sf_dir):
    """The x_embed_near_dup_planted body (verbatim future
    registration): plant copy pairs in-plan, grade the production
    LSH + exact-verify path against the closed-form pair list."""
    from pyspark.sql import functions as F

    from hive_scripts_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )
    from hive_scripts_spark.plans.registry import table

    emb = table(spark, sf_dir, "embeddings")
    staged = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    ).select(
        "vec_id",
        "vec",
        F.aggregate(
            "vec", F.lit(0.0), lambda acc, x: acc + x * x
        ).alias("n2"),
        F.element_at("vec", 1).alias("v0"),
    )
    kept = staged.where(
        (F.col("n2") > 0)
        & (F.col("v0") * F.col("v0") > _ENERGY_CUT * F.col("n2"))
    )
    flipped = F.transform(
        "vec", lambda x, i: F.when(i == 0, -x).otherwise(x)
    )
    copies = kept.select(
        "vec_id",
        F.posexplode(
            F.array(F.col("vec"), F.col("vec"), flipped)
        ).alias("c", "embedding"),
    ).select(
        (F.col("vec_id") * 3 + F.col("c")).alias("vec_id"), "embedding"
    )
    return embedding_near_dup_pairs(
        copies, threshold=_THRESHOLD, use_lsh=True
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


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_queued_query_matches_oracle(spark, sf_dir):
    got = planted_query(spark, sf_dir)
    spark_digest = _digest(got.columns, got.collect())
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
            )
        rel = con.sql(PLANTED_ORACLE)
        duck_digest = _digest(rel.columns, rel.fetchall())
    finally:
        con.close()
    assert len(spark_digest) == len(duck_digest) > 0
    assert spark_digest == duck_digest


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_planted_margins(sf_dir):
    """The two data properties the closed form leans on, pinned WITH
    MARGIN at both grading scales (DuckDB-side so the pin is
    engine-independent):

    1. no base row sits near the 2% energy boundary (the strict `>`
       cannot flip between engines on a rounding ulp);
    2. the max cross-base cosine among planted copies stays far below
       the 0.99 threshold (< 0.9), so cross pairs can never enter the
       output whatever the banding does — this also proves no two base
       vectors are identical or near-identical.
    """
    con = duckdb.connect()
    try:
        con.execute(
            "create view embeddings as select * from "
            f"'{sf_dir}/embeddings.parquet'"
        )
        boundary = con.sql(
            f"""
            with m as (
              select list_dot_product(cast(embedding as double[]),
                                      cast(embedding as double[])) as n2,
                     cast(embedding[1] as double) as v0
              from embeddings
            )
            select min(abs(v0 * v0 / n2 - {_ENERGY_CUT})) from m
            where n2 > 0
            """
        ).fetchone()[0]
        assert boundary > 1e-9, f"energy-cut boundary margin: {boundary}"
        # planted corpus = verbatim + dim0-flip copies of kept rows;
        # cross-base pairs only (same-base pairs are the graded output
        # and the structurally-bounded flip pairs)
        max_cross = con.sql(
            f"""
            with m as (
              select vec_id, cast(embedding as double[]) as vec,
                     list_dot_product(cast(embedding as double[]),
                                      cast(embedding as double[])) as n2,
                     cast(embedding[1] as double) as v0
              from embeddings
            ), kept as (
              select * from m
              where n2 > 0 and v0 * v0 > {_ENERGY_CUT} * n2
            ), copies as (
              select vec_id * 3 + c as cid, vec_id as base,
                     case when c < 2 then vec
                          else list_transform(
                            vec,
                            (x, i) -> case when i = 1 then -x else x end)
                     end as vec
              from kept, (select unnest([0, 1, 2]) as c)
            )
            select max(
              list_dot_product(a.vec, b.vec)
              / (sqrt(list_dot_product(a.vec, a.vec))
                 * sqrt(list_dot_product(b.vec, b.vec))))
            from copies a join copies b
              on a.base < b.base
            """
        ).fetchone()[0]
        assert max_cross < 0.9, f"max cross-base cosine: {max_cross}"
    finally:
        con.close()


def test_planted_arms_fire(spark):
    """Both interesting arms execute at the grading sf: every kept base
    contributes exactly its copy pair at cosine 1.0 (guaranteed-
    candidate recall through the real banding), and NO flip pair leaks
    (the verify-kill arm — flip pairs do reach the candidate stage)."""
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.01"
    rows = planted_query(spark, sf_dir).collect()
    got = {(r["a_id"], r["b_id"]): r["cosine_sim"] for r in rows}
    assert len(got) > 0
    assert all(v == 1.0 for v in got.values())
    assert all(b == a + 1 and a % 3 == 0 for a, b in got)
    # flip pairs really are candidates (the kill arm is exercised, not
    # vacuous): rerun the pipeline at a threshold below the flip bound
    # and require strictly more pairs — those extras are the flip/cross
    # candidates the 0.99 run verified away
    from hive_scripts_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )
    from hive_scripts_spark.plans.registry import table

    emb = table(spark, sf_dir, "embeddings")
    staged = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("vec"),
    ).select(
        "vec_id",
        "vec",
        F.aggregate("vec", F.lit(0.0), lambda acc, x: acc + x * x).alias(
            "n2"
        ),
        F.element_at("vec", 1).alias("v0"),
    )
    kept = staged.where(
        (F.col("n2") > 0)
        & (F.col("v0") * F.col("v0") > _ENERGY_CUT * F.col("n2"))
    )
    flipped = F.transform("vec", lambda x, i: F.when(i == 0, -x).otherwise(x))
    copies = kept.select(
        "vec_id",
        F.posexplode(
            F.array(F.col("vec"), F.col("vec"), flipped)
        ).alias("c", "embedding"),
    ).select((F.col("vec_id") * 3 + F.col("c")).alias("vec_id"), "embedding")
    loose = embedding_near_dup_pairs(copies, threshold=0.5, use_lsh=True)
    n_loose = loose.count()
    assert n_loose > len(got), (
        "expected sub-threshold candidates (flip pairs at cosine "
        f"< 0.96) below the graded threshold; loose={n_loose}, "
        f"graded={len(got)}"
    )


# ---------------------------------------------------------------------------
# Same recipe, text side: the planted-twin row that value-grades the
# xxhash64 minhash-LSH path (today `x_dedup_minhash_lsh` is rows-only —
# its banding hash is engine-specific, so no DuckDB oracle can replay
# it). Identical planted texts have identical shingle SETS, hence
# identical minhash signatures and band buckets on ANY hash function —
# guaranteed candidates — and the exact-Jaccard verify layer (which IS
# engine-portable) pins everything below threshold, so the output is
# the closed-form twin-pair list without restating the hash in SQL.
#
# Threshold choice is data-aware: the testdata corpus contains natural
# near-dup pairs up to Jaccard 0.9894 (measured; pinned below with
# margin) and ZERO distinct docs with identical shingle sets, so at
# threshold 0.995 every natural pair dies at exact verify WHATEVER the
# banding did (the kill arm — and at J≈0.989 they virtually all reach
# it), while twin pairs (J = 1.0) pass. Margin to the natural max:
# 0.0056, pinned at < 0.991 so a testdata regeneration that narrows it
# fails the pin before it can flake the grade.
# ---------------------------------------------------------------------------

MINHASH_PLANTED_NAME = "x_dedup_minhash_planted"

_MH_THRESHOLD = 0.995
#: the engine's normalize_whitespace, restated (the _NORM macro idiom
#: of plans/extension_queries.py)
_MH_NORM = (
    r"trim(regexp_replace(regexp_replace(text, chr(13), '', 'g'),"
    r" '\s+', ' ', 'g'))"
)

MINHASH_PLANTED_ORACLE = f"""
    with toks as (
      select doc_id, string_split({_MH_NORM}, ' ') as ws from documents
    )
    select doc_id * 2 as a_id, doc_id * 2 + 1 as b_id,
           cast(1.0 as double) as jaccard
    from toks where len(ws) >= 3
"""

#: engine-faithful shingle sets (word 3-grams over the normalized
#: token stream, distinct, sorted for set comparison) for the pins
_MH_SETS = f"""
    with toks as (
      select doc_id, string_split({_MH_NORM}, ' ') as ws from documents
    ), sets as (
      select doc_id, list_sort(list_distinct([
               ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
               for i in range(1, greatest(len(ws) - 1, 1))
             ])) as sh
      from toks where len(ws) >= 3
    )
"""


def minhash_planted_query(spark, sf_dir):
    """The x_dedup_minhash_planted body (verbatim future registration):
    two identical copies per doc through the production banded-LSH +
    exact-verify chain; the graded output is exactly the twin pairs."""
    from pyspark.sql import functions as F

    from hive_scripts_spark.operators.dedup import minhash_lsh_pairs
    from hive_scripts_spark.plans.registry import table

    docs = table(spark, sf_dir, "documents")
    copies = docs.select(
        F.explode(
            F.array(F.col("doc_id") * 2, F.col("doc_id") * 2 + 1)
        ).alias("doc_id"),
        "text",
    )
    return minhash_lsh_pairs(
        copies,
        threshold=_MH_THRESHOLD,
        parallelism=spark.sparkContext.defaultParallelism,
    )


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_minhash_queued_matches_oracle(spark, sf_dir):
    got = minhash_planted_query(spark, sf_dir)
    spark_digest = _digest(got.columns, got.collect())
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
            )
        rel = con.sql(MINHASH_PLANTED_ORACLE)
        duck_digest = _digest(rel.columns, rel.fetchall())
    finally:
        con.close()
    assert len(spark_digest) == len(duck_digest) > 0
    assert spark_digest == duck_digest


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_minhash_planted_margins(sf_dir):
    """The two data properties the closed form leans on, with margin:
    no two distinct docs share an identical shingle set (else their
    cross-copy pairs would deterministically join the output and the
    oracle would have to enumerate set-groups), and the max
    non-identical-set pair Jaccard stays below 0.991 (threshold 0.995
    minus margin), so natural near-dups always die at exact verify."""
    con = duckdb.connect()
    try:
        con.execute(
            "create view documents as select * from "
            f"'{sf_dir}/documents.parquet'"
        )
        identical_groups = con.sql(
            f"""{_MH_SETS}
            select count(*) from (
              select sh from sets group by sh having count(*) > 1)
            """
        ).fetchone()[0]
        assert identical_groups == 0
        max_natural = con.sql(
            f"""{_MH_SETS}
            select max(len(list_intersect(a.sh, b.sh)) * 1.0
                       / len(list_distinct(list_concat(a.sh, b.sh))))
            from sets a join sets b
              on a.doc_id < b.doc_id and a.sh <> b.sh
            """
        ).fetchone()[0]
        assert max_natural < 0.991, f"max natural jaccard: {max_natural}"
    finally:
        con.close()


def test_minhash_planted_arms_fire(spark):
    """Non-vacuous at the grading sf: one twin pair per eligible doc at
    exactly 1.0, and the verify-kill arm really runs — a loose 0.5
    threshold on the same corpus surfaces strictly more pairs (the
    natural near-dups the 0.995 run verified away)."""
    from pyspark.sql import functions as F

    from hive_scripts_spark.operators.dedup import minhash_lsh_pairs
    from hive_scripts_spark.plans.registry import table

    sf_dir = "/root/testdata/sf0.01"
    rows = minhash_planted_query(spark, sf_dir).collect()
    got = {(r["a_id"], r["b_id"]): r["jaccard"] for r in rows}
    assert len(got) > 0
    assert all(v == 1.0 for v in got.values())
    assert all(b == a + 1 and a % 2 == 0 for a, b in got)

    docs = table(spark, sf_dir, "documents")
    copies = docs.select(
        F.explode(
            F.array(F.col("doc_id") * 2, F.col("doc_id") * 2 + 1)
        ).alias("doc_id"),
        "text",
    )
    loose = minhash_lsh_pairs(
        copies,
        threshold=0.5,
        parallelism=spark.sparkContext.defaultParallelism,
    )
    n_loose = loose.count()
    assert n_loose > len(got), (
        "expected sub-threshold natural near-dup candidates below the "
        f"graded threshold; loose={n_loose}, graded={len(got)}"
    )
