"""Unit tests for functions/zorder — Morton interleave keys.

Pinned against an independent pure-Python bit reference plus the
locality property that justifies the layout: sorting by the z-key
bounds BOTH dimensions' spread within every contiguous chunk."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_scripts_spark.functions.zorder import morton_key, morton_key_sql


def _py_morton(a: int, b: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_matches_python_reference(spark):
    rows = [(a, b) for a in [0, 1, 5, 255, 65535] for b in [0, 3, 128, 65535]]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", morton_key("a", "b").alias("z")).collect()
    }
    for (a, b), z in got.items():
        assert z == _py_morton(a, b, 16), (a, b)


@pytest.mark.parametrize("bits", [10, 16])
def test_spark_and_sql_twins_agree(spark, bits):
    import duckdb

    # values >= 32768 at bits=16 exercised deliberately: DuckDB shifts
    # in the OPERAND's type, and an un-cast int32 column overflows at
    # bit 31 (a review-caught twin divergence the sorted-multiset form
    # of this test missed) — hence int32 inputs AND a keyed comparison
    rows = [(i * 37 % 65536, i * 9091 % 65536) for i in range(300)]
    df = spark.createDataFrame(rows, "a int, b int")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", morton_key("a", "b", bits=bits).alias("z")
        ).collect()
    }
    want = {
        (r[0], r[1]): r[2]
        for r in duckdb.sql(
            "select a, b, "
            + morton_key_sql("a", "b", bits=bits)
            + " as z from (select unnest(cast("
            + str([a for a, _ in rows])
            + " as int[])) as a, unnest(cast("
            + str([b for _, b in rows])
            + " as int[])) as b)"
        ).fetchall()
    }
    assert got == want


def test_sql_twin_parenthesizes_operands(spark):
    import duckdb

    # a low-precedence caller expression must not mis-parse inside the
    # generated shifts
    got = duckdb.sql(
        "select " + morton_key_sql("1 + 2", "0", bits=4) + " as z"
    ).fetchall()[0][0]
    assert got == _py_morton(3, 0, 4)


def test_locality_property(spark):
    # 32x32 grid sorted by z-key: every contiguous 64-row chunk spans
    # at most a small sub-square in BOTH dimensions (a row-major sort
    # would span the full 32 in the minor dimension)
    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "x long, y long")
    ordered = (
        df.select("x", "y", morton_key("x", "y", bits=5).alias("z"))
        .orderBy("z")
        .collect()
    )
    for start in range(0, len(ordered), 64):
        chunk = ordered[start : start + 64]
        xs = [r["x"] for r in chunk]
        ys = [r["y"] for r in chunk]
        assert max(xs) - min(xs) <= 8
        assert max(ys) - min(ys) <= 8


def test_bit_width_validation(spark):
    with pytest.raises(ValueError):
        morton_key("a", "b", bits=0)
    with pytest.raises(ValueError):
        morton_key_sql("a", "b", bits=32)


def test_jvm_only_projection(spark):
    df = spark.createDataFrame([(1, 2)], "a long, b long")
    plan = (
        df.select(morton_key("a", "b").alias("z"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan and "Python" not in plan, plan
