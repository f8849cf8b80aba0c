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


def test_spark_and_sql_twins_agree(spark):
    import duckdb

    rows = [(i * 37 % 1000, i * 91 % 1000) for i in range(200)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = sorted(
        r["z"]
        for r in df.select(morton_key("a", "b", bits=10).alias("z")).collect()
    )
    want = sorted(
        r[0]
        for r in duckdb.sql(
            "select "
            + morton_key_sql("a", "b", bits=10)
            + " as z from (select unnest("
            + str([a for a, _ in rows])
            + ") as a, unnest("
            + str([b for _, b in rows])
            + ") as b)"
        ).fetchall()
    )
    assert got == want


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
