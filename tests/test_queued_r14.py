"""Registration parity checks for the three r14 capacity-swap queries.

The queries were pre-verified (r13) with their bodies and oracle SQL
held as literals in this file; the r14 swap moved all three verbatim
into ``plans/extension_queries.py``, retiring ``a4_stratified_sample``,
``x_mixture_epoch``, and ``x_ann_pq_index_search`` (the strict-
rotation-safe retirees — every one drawn from the r14 stale set, the
50 r11-green queries, per the r13 VERDICT's simulation; COVERAGE.md
"Registry capacity"). These tests now pull the REGISTERED query +
oracle from the registry and re-run the same order-insensitive digest
comparison as ``tools/parity.py`` at BOTH sf0.001 and the driver's
grading scale sf0.01, so any later edit to either side re-proves
parity instead of trusting the r13 snapshot.
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
    # x_events_sessionize_chunked retired from the graded registry in
    # the r17 capacity swap (slot funds x_countmin_heavy): its parity
    # now runs in tests/test_retired_queries.py against the frozen r14
    # oracle, and test_chunked_shares_the_sessionize_oracle below keeps
    # the shared-oracle invariant against that frozen text
    "x_multimodal_resize_png",
    "x_audio_zero_crossings",
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


def test_queued_png_literals():
    """The PNG plan literals are exactly the test encoder's output for
    constant index-k images over _PNG_PALETTE — re-derived, so an edit
    to either side fails."""
    import numpy as np

    from hive_scripts_spark.plans.extension_queries import (
        _PNG_CONST_HEX,
        _PNG_PALETTE,
    )
    from tests.test_multimodal import _png

    for k, want in _PNG_CONST_HEX.items():
        idx = np.full((8, 8), k, np.uint8)
        got = _png(idx, color_type=3, bitd=2, palette=list(_PNG_PALETTE))
        assert got.hex() == want, k


def test_chunked_shares_the_sessionize_oracle():
    """The chunked escalation was graded against the SAME oracle text
    as the single-window form — the whole point of the r14
    registration. Retired r17: the invariant now pins the FROZEN
    oracle (tests/test_retired_queries.py) to the live sessionize
    oracle, so neither side can drift without tripping this."""
    from hive_scripts_spark.plans.registry import ORACLES
    from tests.test_retired_queries import RETIRED

    assert RETIRED["x_events_sessionize_chunked"] == ORACLES[
        "x_events_sessionize"
    ]


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
@pytest.mark.parametrize("name", NAMES)
def test_registered_r14_query_matches_its_oracle(spark, sf_dir, name):
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
