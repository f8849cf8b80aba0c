"""Registration parity check for ``x_cluster_balanced_sample``.

The query was pre-verified (r10) with its body and oracle SQL held as
literals in this file; the r11 swap moved both verbatim into
``plans/extension_queries.py`` as the planned 150th oracled slot
(COVERAGE.md "Planned swap (r11)"). This test now pulls the REGISTERED
query + oracle from the registry and re-runs the same
order-insensitive digest comparison as ``tools/parity.py`` at BOTH
sf0.001 and the driver's grading scale sf0.01, so any later edit to
either side re-proves parity instead of trusting the r10 snapshot.
"""

from __future__ import annotations

import math

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

NAME = "x_cluster_balanced_sample"


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
def test_registered_balanced_sample_matches_its_oracle(spark, sf_dir):
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
    # the cut must actually fire (cap < every cell's population)
    assert all(r["pick_order"] <= 40 for r in rows)
