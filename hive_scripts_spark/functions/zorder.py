"""Z-order (Morton) interleave keys for multi-dimensional data layout.

Sorting a table by the bit-interleave of two (or more) columns before
writing clusters rows so that BOTH dimensions are locally dense in
every file: parquet min/max row-group stats then prune on either
column, where a single-column sort only prunes its own. The standard
lake-layout move (Delta OPTIMIZE ZORDER, Iceberg sort orders) for
two-dimensional access patterns — (host, fetch_time) recrawl scans,
(user, day) event slices.

The key is pure integer bit arithmetic (shifts / and / or), exactly
portable: the DuckDB twin is the same generated expression, so the
key — unusually for a layout primitive — is value-gradable. Spark
side stays whole-stage-codegen JVM expressions; no UDF, no shuffle
(the key is a projection; the sort that USES it is the one exchange
the layout pays by design).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, functions as F


def morton_key(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns: bit ``i`` of ``a`` lands at position ``2i``, of ``b`` at
    ``2i+1``. Callers map their dimensions onto ``[0, 2^bits)`` first
    (modulo, bucketing, or rank) — the key preserves locality of
    whatever grid it is given. ``bits <= 31`` keeps the result in a
    positive bigint."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31]: {bits}")
    ca = (F.col(a) if isinstance(a, str) else a).cast("long")
    cb = (F.col(b) if isinstance(b, str) else b).cast("long")
    terms = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(ca, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(cb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return reduce(Column.__add__, terms).cast("long")


def morton_key_sql(a: str, b: str, bits: int = 16) -> str:
    """The ANSI-SQL twin of :func:`morton_key` (DuckDB-compatible
    generated expression) — kept next to the Spark form so the two can
    never drift."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31]: {bits}")
    # cast each operand to bigint (DuckDB shifts in the OPERAND's type:
    # an int32 column overflows at bit 31 with a data-dependent error
    # the Spark twin — which casts to long — never raises) and
    # parenthesize it (a caller expression with low-precedence
    # operators would otherwise mis-parse inside the shift)
    ca, cb = f"cast(({a}) as bigint)", f"cast(({b}) as bigint)"
    terms = []
    for i in range(bits):
        terms.append(f"((({ca} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({cb} >> {i}) & 1) << {2 * i + 1})")
    return "cast(" + " + ".join(terms) + " as bigint)"
