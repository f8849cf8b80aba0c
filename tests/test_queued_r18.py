"""Registration parity checks for the three r18 capacity-swap queries.

The queries were pre-verified (r16-r17) with their bodies and oracle
SQL held as literals in this file; the r18 swap moved all three
verbatim into ``plans/extension_queries.py``, retiring
``x_dedup_exact``, ``x_doc_fingerprint``, and
``x_text_unigram_logprob`` (the strict-rotation-safe retirees — every
one drawn from the r18 stale set, the 50 r15-green queries, per the
r17 VERDICT's simulation; COVERAGE.md "Registry capacity"). These
tests now pull the REGISTERED query + oracle from the registry and
re-run the same order-insensitive digest comparison as
``tools/parity.py`` at BOTH sf0.001 and the driver's grading scale
sf0.01, so any later edit to either side re-proves parity instead of
trusting the pre-swap snapshot.

Determinism note: every graded digit-hist column is exact
integer/decimal/string arithmetic (NO ``log()`` — cross-engine libm
log is not correctly rounded, so a log-bucketed DDSketch could flip
bucket indexes between engines; the digit-string form cannot), and the
quantile row grades only the exact (q, sign, decade, sub) bucket picks
— the float midpoint estimate stays a pytest-pinned convenience
column. The robots LIKE patterns are plan literals, so the oracle
replays the RFC 9309 longest-match / allow-wins-tie fold in pure SQL
over the same fixture rules.
"""

from __future__ import annotations

import math

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

NAMES = (
    "x_digit_hist",
    "x_digit_quantiles",
    "x_robots_decisions",
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


def test_digit_quantile_picks_are_value_monotone(spark):
    """Quantile semantics on the graded shape: the picked buckets'
    value order key ``sign * (decade*1000 + sub)`` must be
    non-decreasing in q (a cumulative-count selection that went
    backwards would mean the bucket ordering or the ceil(q*n) rank
    broke)."""
    from hive_scripts_spark.plans.registry import QUERIES

    rows = sorted(
        QUERIES["x_digit_quantiles"](spark, "/root/testdata/sf0.01").collect(),
        key=lambda r: r["q"],
    )
    assert [r["q"] for r in rows] == [0.25, 0.5, 0.75, 0.95, 0.99]
    ords = [r["sign"] * (r["decade"] * 1000 + r["sub"]) for r in rows]
    assert ords == sorted(ords)


def test_robots_decisions_per_arm(spark):
    """The six URL arms decide exactly as RFC 9309 prescribes for the
    fixture rules: 0 no-match allow, 1 prefix disallow, 2 longer-Allow
    override, 3 $-anchored wildcard disallow, 4 anchor miss via query
    string (allow), 5 non-URL passthrough (allow)."""
    from hive_scripts_spark.plans.registry import QUERIES

    rows = QUERIES["x_robots_decisions"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    expected = {0: True, 1: False, 2: True, 3: False, 4: True, 5: True}
    for r in rows:
        assert r["robots_allowed"] is expected[r["doc_id"] % 6], r


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
@pytest.mark.parametrize("name", NAMES)
def test_registered_r18_query_matches_its_oracle(spark, sf_dir, name):
    from hive_scripts_spark.plans.registry import ORACLES, QUERIES

    assert name in QUERIES and name in ORACLES

    got = QUERIES[name](spark, sf_dir)
    spark_digest = _digest(got.columns, got.collect())

    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
            )
        rel = con.sql(ORACLES[name])
        duck_digest = _digest(rel.columns, rel.fetchall())
    finally:
        con.close()
    assert len(spark_digest) == len(duck_digest) > 0
    assert spark_digest == duck_digest
