"""Bulk plan-literal builders: one parser round-trip, not thousands.

Model parameters (IVF centroids, PQ codebooks, LSH hyperplanes, ADC
lookup tables) embed in query plans as literal arrays. Building those
with per-element ``F.lit(x).cast("double")`` costs 2+ py4j round trips
PER ELEMENT — measured 8-14 s of pure driver time for a 40×64 centroid
array (r19 optimization round; the whole query then executes in ~1 s).
Emitting the same literal as ONE SQL string through ``F.expr`` builds in
milliseconds and yields a bit-identical plan:

* every finite double is rendered ``repr(x) + "D"`` — Spark's
  ``D``-suffixed literal parses via ``Double.parseDouble``, and
  ``repr`` is the shortest round-tripping decimal, so the parsed
  double is bit-identical to the Python float (verified over random
  values, ``-0.0``, denormals, and both extremes; schemas match the
  ``F.lit`` form exactly, nullability included);
* NaN/±Infinity render as ``CAST('NaN' AS DOUBLE)`` etc. (model params
  should never contain them, but a corrupt input must not produce an
  unparseable plan string).

These helpers change HOW a literal is constructed, never its value:
callers' query results are byte-identical to the per-element form.
"""

from __future__ import annotations

import math
from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F


def sql_double(x: float) -> str:
    """Exact SQL text for one double value (see module docstring)."""
    v = float(x)
    if math.isnan(v):
        return "CAST('NaN' AS DOUBLE)"
    if math.isinf(v):
        sign = "-" if v < 0 else ""
        return f"CAST('{sign}Infinity' AS DOUBLE)"
    return f"{v!r}D"


def sql_double_array(xs: Iterable[float]) -> str:
    """SQL text for an ``array<double>`` literal."""
    return "array(" + ",".join(sql_double(x) for x in xs) + ")"


def lit_doubles(xs: Iterable[float]) -> Column:
    """``array<double>`` literal column, built in one parser call —
    the bulk replacement for ``F.array(*[F.lit(x).cast("double")])``."""
    return F.expr(sql_double_array(xs))


def sql_int(i: int) -> str:
    """SQL text for an integral literal. Spark types the numeral INT
    when it fits 32 bits and BIGINT otherwise — the same typing
    ``F.lit(python_int)`` produces.

    The two signed minimums need special cases (ADVICE r19): SQL lexes
    the NUMERAL before applying unary minus, so ``-9223372036854775808L``
    overflows the BIGINT lexer despite being in range, and
    ``-2147483648`` types BIGINT (its numeral overflows INT) where
    ``F.lit`` gives IntegerType. Both render as a constant-folded
    ``min+1 - 1`` expression of the right type instead."""
    v = int(i)
    if not (-(1 << 63) <= v < (1 << 63)):
        raise ValueError(f"integral literal out of BIGINT range: {v}")
    if v == -(1 << 63):
        return "(-9223372036854775807L - 1L)"
    if v == -(1 << 31):
        return "(-2147483647 - 1)"
    return f"{v}L" if not (-(1 << 31) <= v < (1 << 31)) else str(v)


def sql_struct(**fields: str) -> str:
    """SQL text for a ``named_struct`` literal from already-rendered
    field SQL fragments (keyword order = field order)."""
    inner = ",".join(f"'{name}',{frag}" for name, frag in fields.items())
    return f"named_struct({inner})"


def lit_struct_array(structs: Iterable[str]) -> Column:
    """``array<struct<...>>`` column from rendered struct fragments,
    one parser call for the whole model."""
    return F.expr("array(" + ",".join(structs) + ")")
