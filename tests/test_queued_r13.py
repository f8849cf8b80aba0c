"""Registration parity check for ``x_multimodal_frames``.

The query was pre-verified (r12) with its body and oracle SQL held as
literals in this file; the r13 swap moved both verbatim into
``plans/extension_queries.py``, retiring ``x_events_session_window``
(the strict-rotation-safe retiree — COVERAGE.md "Registry capacity").
This test now pulls the REGISTERED query + oracle from the registry
and re-runs the same order-insensitive digest comparison as
``tools/parity.py`` at BOTH sf0.001 and the driver's grading scale
sf0.01, so any later edit to either side re-proves parity instead of
trusting the r12 snapshot.
"""

from __future__ import annotations

import math

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

NAME = "x_multimodal_frames"


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    return str(v)


def _digest(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x01".join(_norm(r[i]) for i in order) for r in rows)


def test_frame_md5_literals():
    """The oracle's md5 literals are exactly the md5 of the registered
    JPEG plan literals — re-derived so an edit to either side fails."""
    import hashlib

    from hive_scripts_spark.plans.extension_queries import (
        _JPEG_GRAY_HEX,
        _JPEG_GRAY_MD5,
    )

    assert set(_JPEG_GRAY_MD5) == set(_JPEG_GRAY_HEX)
    for g, want in _JPEG_GRAY_MD5.items():
        assert hashlib.md5(bytes.fromhex(_JPEG_GRAY_HEX[g])).hexdigest() == want


@pytest.mark.parametrize(
    "sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_registered_frames_query_matches_its_oracle(spark, sf_dir):
    from hive_scripts_spark.plans.registry import ORACLES, QUERIES

    assert NAME in QUERIES and NAME in ORACLES

    got = QUERIES[NAME](spark, sf_dir)
    rows = got.collect()
    spark_digest = _digest(got.columns, rows)

    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
            )
        rel = con.sql(ORACLES[NAME])
        duck_digest = _digest(rel.columns, rel.fetchall())
    finally:
        con.close()

    assert len(spark_digest) == len(duck_digest) > 0
    assert spark_digest == duck_digest
    # every_n=2 over a 3-frame clip: exactly frames 0 and 2 per doc
    assert {r["frame_index"] for r in rows} == {0, 2}
