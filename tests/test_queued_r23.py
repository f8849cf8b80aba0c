"""Queued r23 registration candidates (the ``test_queued_r15.py``
pattern): bodies + oracles held as literals, parity-verified at
sf0.001 AND the driver's grading scale sf0.01, awaiting a future
capacity swap. COVERAGE.md "Post-queue roadmap" item 2's RECIPE REUSE:
the planted-twin construction (see ``test_queued_r22.py``) applied to
the two remaining rows-only xxhash64 operators.

1. ``x_doc_rolling_hash_planted`` — value-grades
   ``textstats.doc_fingerprint``'s 64-bit polynomial rolling hash
   (xxhash64-combined, engine-specific, rows-only since registration
   as ``x_doc_rolling_hash``). Twin copies of every doc go through the
   real fingerprint; pairs join on the PORTABLE ``content_md5`` (which
   DuckDB replays exactly, and which pairs precisely the twins — the
   corpus has zero distinct docs with identical normalized text,
   pinned below), and the graded VALUE is ``rolling_match`` — whether
   the two copies' rolling hashes agree. A plumbing regression
   anywhere in the normalize → tokenize → fold chain that makes the
   hash depend on anything besides content (partitioning, row order,
   id) flips the boolean and fails the value hash, without the oracle
   ever restating xxhash64.
2. ``x_dedup_components_planted`` — value-grades the
   ``connected_components`` min-label propagation over the xxhash64
   minhash-LSH edge chain (rows-only since registration as
   ``x_dedup_components``; the exact-Jaccard sibling
   ``x_dedup_components_exact`` grades multi-hop closure, this grades
   the PRODUCTION hash path). THREE identical copies per doc at
   threshold 0.995: the three twin edges per doc are guaranteed
   candidates (identical shingle sets ⇒ identical signatures in every
   band), natural near-dup edges die at exact verify (max natural
   Jaccard 0.9894 < 0.995, margin-pinned in ``test_queued_r22.py`` —
   the pin is shared, not duplicated here), so the component set is
   closed-form: ``{3k, 3k+1, 3k+2}`` labeled ``3k`` per eligible doc.
"""

from __future__ import annotations

import math

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

ROLLING_NAME = "x_doc_rolling_hash_planted"
COMPONENTS_NAME = "x_dedup_components_planted"

#: normalize_whitespace restated (the _NORM macro of extension_queries)
_NORM = (
    r"trim(regexp_replace(regexp_replace(text, chr(13), '', 'g'),"
    r" '\s+', ' ', 'g'))"
)

ROLLING_ORACLE = """
    select doc_id * 2 as a_id, doc_id * 2 + 1 as b_id,
           true as rolling_match
    from documents
"""

COMPONENTS_ORACLE = """
    select doc_id * 3 + c as node, doc_id * 3 as component
    from documents, (select unnest([0, 1, 2]) as c)
    where len(string_split(
      trim(regexp_replace(regexp_replace(text, chr(13), '', 'g'),
           '\\s+', ' ', 'g')), ' ')) >= 3
"""

_MH_THRESHOLD = 0.995


def rolling_query(spark, sf_dir):
    """The x_doc_rolling_hash_planted body (verbatim future
    registration): twin fingerprints joined on portable md5, rolling
    agreement graded as a value."""
    from pyspark.sql import functions as F

    from hive_scripts_spark.operators.textstats import doc_fingerprint
    from hive_scripts_spark.plans.registry import table

    docs = table(spark, sf_dir, "documents")
    twins = docs.select(
        F.explode(
            F.array(F.col("doc_id") * 2, F.col("doc_id") * 2 + 1)
        ).alias("doc_id"),
        "text",
    )
    fp = doc_fingerprint(twins)
    a = fp.toDF("a_id", "content_md5", "a_rolling")
    b = fp.toDF("b_id", "content_md5", "b_rolling")
    return (
        a.join(b, "content_md5")
        .where(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            (F.col("a_rolling") == F.col("b_rolling")).alias("rolling_match"),
        )
    )


def components_query(spark, sf_dir):
    """The x_dedup_components_planted body (verbatim future
    registration): min-label propagation over guaranteed twin edges."""
    from pyspark.sql import functions as F

    from hive_scripts_spark.operators.cluster import connected_components
    from hive_scripts_spark.operators.dedup import minhash_lsh_pairs
    from hive_scripts_spark.plans.registry import table

    docs = table(spark, sf_dir, "documents")
    copies = docs.select(
        F.explode(
            F.array(
                F.col("doc_id") * 3,
                F.col("doc_id") * 3 + 1,
                F.col("doc_id") * 3 + 2,
            )
        ).alias("doc_id"),
        "text",
    )
    pairs = minhash_lsh_pairs(
        copies,
        threshold=_MH_THRESHOLD,
        parallelism=spark.sparkContext.defaultParallelism,
    )
    return connected_components(pairs)


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
    [(rolling_query, ROLLING_ORACLE), (components_query, COMPONENTS_ORACLE)],
    ids=[ROLLING_NAME, COMPONENTS_NAME],
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


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_rolling_planted_margin(sf_dir):
    """The md5-join closed form leans on one data property: no two
    distinct docs share identical NORMALIZED text (else their cross
    pairs would join the output). Pinned engine-independently."""
    con = duckdb.connect()
    try:
        con.execute(
            "create view documents as select * from "
            f"'{sf_dir}/documents.parquet'"
        )
        n, d = con.sql(
            f"select count(*), count(distinct md5({_NORM})) from documents"
        ).fetchone()
        assert n == d, f"{n - d} duplicate normalized texts"
    finally:
        con.close()


def test_components_planted_arms_fire(spark):
    """Non-vacuous at the grading sf: every eligible doc yields exactly
    one 3-member component labeled by its lowest copy id — i.e. the
    propagation really merged the three pairwise twin edges."""
    from collections import Counter

    rows = components_query(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) > 0
    by_comp = Counter(r["component"] for r in rows)
    assert all(c == 3 for c in by_comp.values())
    assert all(r["component"] % 3 == 0 for r in rows)
    assert all(r["node"] - r["component"] in (0, 1, 2) for r in rows)
