"""Registration parity checks for the three r15 capacity-swap queries.

The queries were pre-verified (r14) with their bodies and oracle SQL
held as literals in this file; the r15 swap moved all three verbatim
into ``plans/extension_queries.py``, retiring
``x_dedup_minhash_bucketcap``, ``x_ann_ivf_assign``, and
``j_semi_nations_with_suppliers`` (the strict-rotation-safe retirees —
every one drawn from the r15 stale set, the 50 r12-green queries, per
the r14 VERDICT's simulation; COVERAGE.md "Registry capacity"). These
tests now pull the REGISTERED query + oracle from the registry and
re-run the same order-insensitive digest comparison as
``tools/parity.py`` at BOTH sf0.001 and the driver's grading scale
sf0.01, so any later edit to either side re-proves parity instead of
trusting the r14 snapshot.
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
    "x_validate_expectations",
    "x_multimodal_resize_gif",
    "x_text_bigram_logprob",
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


def test_queued_gif_literals():
    """The GIF plan literals are exactly the test encoder's output for
    constant index-k images over _GIF_PALETTE — re-derived, so an edit
    to either side fails."""
    import numpy as np

    from hive_scripts_spark.plans.extension_queries import (
        _GIF_CONST_HEX,
        _GIF_PALETTE,
    )
    from tests.test_multimodal import _gif

    for k, want in _GIF_CONST_HEX.items():
        idx = np.full((8, 8), k, np.uint8)
        got = _gif(idx, list(_GIF_PALETTE))
        assert got.hex() == want, k


def test_vex_branches_fire(spark):
    """The report's interesting branches execute at the grading sf:
    three constraints fire, three pass (the r10 planted-duplication
    lesson applied to a validation report)."""
    from hive_scripts_spark.plans.registry import QUERIES

    out = QUERIES["x_validate_expectations"](
        spark, "/root/testdata/sf0.01"
    ).collect()
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
@pytest.mark.parametrize("name", NAMES)
def test_registered_r15_query_matches_its_oracle(spark, sf_dir, name):
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
