"""Unit tests for operators/graph — PageRank and its fixed-point
integer portable twin. The twin is pinned against an independent
pure-Python reference (same integer semantics) on hand graphs and a
larger deterministic graph; the double face against analytic values."""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from hive_scripts_spark.operators.graph import (
    UNIT,
    pagerank,
    pagerank_portable,
)


def _py_pagerank_int(edges, iterations=5, damping_pct=85, unit=UNIT):
    """Independent integer reference (dict/loop — no Spark)."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    base = unit // n
    tel = ((100 - damping_pct) * base) // 100
    deg = Counter(s for s, _ in edges)
    r = {v: base for v in nodes}
    for _ in range(iterations):
        inflow = defaultdict(int)
        for s, d in edges:
            inflow[d] += r[s] // deg[s]
        dang = sum(r[v] for v in nodes if v not in deg)
        r = {
            v: tel + (damping_pct * (inflow.get(v, 0) + dang // n)) // 100
            for v in nodes
        }
    return r


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_portable_matches_reference_with_dangling_sink(spark):
    pairs = [(1, 2), (2, 3), (1, 3)]  # node 3 is a dangling sink
    got = _ranks(pagerank_portable(_edges_df(spark, pairs), iterations=5))
    assert got == _py_pagerank_int(pairs, iterations=5)
    # the sink receives from everyone: highest rank
    assert got[3] == max(got.values())


def test_portable_matches_reference_on_larger_graph(spark):
    pairs = [(i, (i * 7 + 3) % 50) for i in range(50)] + [
        (i, (i * 13 + 1) % 50) for i in range(0, 50, 2)
    ]
    got = _ranks(pagerank_portable(_edges_df(spark, pairs), iterations=6))
    assert got == _py_pagerank_int(pairs, iterations=6)


def test_portable_partitioning_invariance(spark):
    pairs = [(i, (i * 7 + 3) % 50) for i in range(50)]
    df1 = _edges_df(spark, pairs).repartition(1)
    df8 = _edges_df(spark, pairs).repartition(8)
    assert _ranks(pagerank_portable(df1)) == _ranks(pagerank_portable(df8))


def test_portable_mass_approximately_conserved(spark):
    pairs = [(1, 2), (2, 3), (3, 1), (4, 1), (2, 4)]
    got = _ranks(pagerank_portable(_edges_df(spark, pairs), iterations=5))
    total = sum(got.values())
    # floor losses only: ≤ ~(n + 2) micro-units per step
    assert UNIT - 5 * (len(got) + 2) * 2 <= total <= UNIT


def test_portable_dedupes_multi_edges_and_drops_nulls(spark):
    pairs = [(1, 2), (1, 2), (2, 1)]
    df = spark.createDataFrame(
        pairs + [(None, 1), (1, None)], "src long, dst long"
    )
    got = _ranks(pagerank_portable(df, iterations=4))
    assert got == _py_pagerank_int([(1, 2), (2, 1)], iterations=4)
    # symmetric 2-cycle: equal ranks
    assert got[1] == got[2]


def test_double_pagerank_cycle_and_star(spark):
    cyc = _ranks(pagerank(_edges_df(spark, [(1, 2), (2, 1)]), iterations=20))
    assert abs(cyc[1] - 0.5) < 1e-9 and abs(cyc[2] - 0.5) < 1e-9
    star = _ranks(
        pagerank(
            _edges_df(spark, [(i, 99) for i in range(1, 9)]), iterations=15
        )
    )
    assert star[99] == max(star.values())
    assert abs(sum(star.values()) - 1.0) < 1e-6


def test_double_agrees_with_portable_ordering(spark):
    pairs = [(i, (i * 7 + 3) % 30) for i in range(30)] + [(5, 7), (9, 7)]
    dbl = _ranks(pagerank(_edges_df(spark, pairs), iterations=8))
    fx = _ranks(
        pagerank_portable(_edges_df(spark, pairs), iterations=8)
    )
    top_dbl = max(dbl, key=dbl.get)
    top_fx = max(fx, key=fx.get)
    assert top_dbl == top_fx


def test_empty_graph(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank_portable(empty).count() == 0
    assert pagerank(empty).count() == 0


def test_rejects_bad_parameters(spark):
    df = _edges_df(spark, [(1, 2)])
    with pytest.raises(ValueError):
        pagerank_portable(df, damping_pct=0)
    with pytest.raises(ValueError):
        pagerank_portable(df, iterations=0)
    with pytest.raises(ValueError):
        pagerank(df, damping=1.0)


def test_no_nested_loop_join_in_plan(spark):
    # the dangling-mass one-row join must be a hash join on the
    # constant key, never a nested-loop cartesian
    df = _edges_df(spark, [(i, (i * 7 + 3) % 20) for i in range(20)])
    plan = (
        pagerank_portable(df, iterations=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
