"""Canonical row serialization + order-insensitive table fingerprints.

This replaces the reference's UC#2 fingerprint — ``md5sum`` over a
comma-delimited ``LIMIT 10`` export (``verizon_automation_script.sh:
219-238``) — which is broken in three ways the survey documents
(SURVEY §2.8.2-3): the export order is nondeterministic, the byte format
is engine-specific, and only the first output file is hashed. The design
here fixes all three:

* **canonical serialization**: every column is rendered to a
  deterministic string (doubles via ``decimal(38,9)``, timestamps via
  their ISO cast, NULL via an explicit sentinel) and joined with ``\\x01``;
* **order-insensitive aggregation**: per-row md5 → 60-bit int → modular
  SUM (commutative + associative, so partitioning and row order are
  irrelevant; the modulus keeps the running sum inside ``decimal(38,0)``
  at any scale — 2^125/2^61 ≈ 10^19 rows before wrap issues);
* **cross-engine reproducible**: the same fingerprint is expressible in
  ANSI SQL (DuckDB oracle) — verified byte-identical in tests.

``xxhash64`` variants are provided for engine-internal use (faster, JVM
whole-stage codegen) where cross-engine parity is not needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: 2^61 - 1 (Mersenne prime) — fingerprint modulus.
FINGERPRINT_MOD = 2305843009213693951

#: sentinel for NULL values in canonical strings (never collides with
#: rendered values, which cannot contain \x00).
NULL_SENTINEL = "\x00"
FIELD_SEP = "\x01"


def _canonical_col(col: Column, dtype: T.DataType) -> Column:
    """Render one column as a deterministic, engine-portable string."""
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        # fixed-point rendering: identical in Spark and DuckDB for values
        # within decimal(38,9); avoids engine-specific float formatting.
        rendered = col.cast("decimal(38,9)").cast("string")
    elif isinstance(dtype, T.ArrayType):
        rendered = F.concat_ws(
            ",", F.transform(col, lambda x: _canonical_col(x, dtype.elementType))
        )
    else:
        rendered = col.cast("string")
    return F.coalesce(rendered, F.lit(NULL_SENTINEL))


def canonical_row_string(df: DataFrame, cols: list[str] | None = None) -> Column:
    """Canonical serialization of a row: columns in **sorted-name order**
    (stable regardless of projection order), ``\\x01``-joined."""
    names = sorted(cols or df.columns)
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    return F.concat_ws(FIELD_SEP, *[_canonical_col(F.col(n), dtypes[n]) for n in names])


def row_hash(df: DataFrame, cols: list[str] | None = None, portable: bool = True) -> Column:
    """Per-row 60-bit hash of the canonical row string.

    ``portable=True`` → md5-prefix (reproducible in any engine with md5);
    ``portable=False`` → ``xxhash64`` (faster, Spark-only).
    """
    s = canonical_row_string(df, cols)
    if portable:
        return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("decimal(38,0)")
    return F.abs(F.xxhash64(s)).cast("decimal(38,0)")


def table_fingerprint(
    df: DataFrame,
    cols: list[str] | None = None,
    group_by: list[str] | None = None,
    portable: bool = True,
) -> DataFrame:
    """Order-insensitive content fingerprint, optionally per group.

    Returns ``[<group cols>,] fingerprint bigint, row_count bigint``. The
    aggregation is a modular sum of per-row hashes — commutative, so the
    result is independent of row order, partition count, and physical
    plan (SURVEY §2.8.2 fix). One shuffle-free map + one (tiny) agg.
    """
    h = row_hash(df, cols, portable=portable).alias("__h")
    mod = F.lit(FINGERPRINT_MOD).cast("decimal(38,0)")
    aggs = [
        (F.sum(F.col("__h")) % mod).cast("bigint").alias("fingerprint"),
        F.count(F.lit(1)).alias("row_count"),
    ]
    projected = df.select(*(group_by or []), h)
    if group_by:
        return projected.groupBy(*group_by).agg(*aggs)
    return projected.agg(*aggs)


def deterministic_sample(
    df: DataFrame,
    key_cols: list[str],
    fraction: float = 0.10,
    buckets: int = 1000,
) -> DataFrame:
    """Deterministic hash-mod sample, aligned across engines and runs.

    The reference's ``LIMIT $sampleDataPercentage`` (an absolute row
    count despite the name — SURVEY §2.8.1) without ``ORDER BY`` yields a
    nondeterministic sample, making its UC#2 hash comparison unsound. A
    hash-mod on the row's key columns picks the *same* logical rows on
    both sides regardless of engine, ordering, or partitioning:
    ``md5(key) % buckets < fraction * buckets``.

    Scale note: this is a narrow-dependency filter — no shuffle, pushes
    into the scan's post-filter, and samples every partition uniformly.
    """
    key = F.concat_ws(FIELD_SEP, *[F.col(c).cast("string") for c in key_cols])
    bucket = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("decimal(38,0)") % buckets
    return df.where(bucket < int(fraction * buckets))


def limit_sample(df: DataFrame, n: int, order_cols: list[str] | None = None) -> DataFrame:
    """Reference-literal sampling: ``LIMIT n`` (``verizon_automation_
    script.sh:220``), made deterministic by an explicit sort when
    ``order_cols`` is given. Prefer :func:`deterministic_sample`."""
    return (df.orderBy(*order_cols) if order_cols else df).limit(n)
